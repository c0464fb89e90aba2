/* Minimal CBLAS declarations for the crosscheck harness.
 *
 * The system ships the reference BLAS runtime (libblas.so.3, which
 * exports cblas_sgemm) but not the development header.  This shim
 * declares exactly what the reference's TensorOps.cc uses
 * (/root/reference/slimt/TensorOps.cc:336-393): the layout/transpose
 * enums and cblas_sgemm, with the standard CBLAS ABI.  The actual
 * sgemm computation is the real system BLAS.
 */
#ifndef CROSSCHECK_SHIM_CBLAS_H
#define CROSSCHECK_SHIM_CBLAS_H

typedef enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER;
typedef enum CBLAS_TRANSPOSE {
  CblasNoTrans = 111,
  CblasTrans = 112,
  CblasConjTrans = 113
} CBLAS_TRANSPOSE;
typedef CBLAS_ORDER CBLAS_LAYOUT;

void cblas_sgemm(CBLAS_ORDER order, CBLAS_TRANSPOSE trans_a,
                 CBLAS_TRANSPOSE trans_b, int m, int n, int k, float alpha,
                 const float *a, int lda, const float *b, int ldb, float beta,
                 float *c, int ldc);

#endif /* CROSSCHECK_SHIM_CBLAS_H */
