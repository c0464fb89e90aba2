// Minimal ruy API shim for the crosscheck harness.
//
// The reference vendors ruy as an (un-checked-out) submodule; this
// shim provides exactly the subset its qmm/Ruy.inl.cc and
// TensorOps.cc use — Context, Order, Layout, Matrix<T>,
// MakeSimpleLayout, MulParams, and Mul — so the reference's own
// provider code (/root/reference/slimt/qmm/Ruy.inl.cc) compiles
// VERBATIM.  Mul is a plain scalar GEMM.
//
// Semantics note: real ruy, for int8 LHS/RHS with an int32
// destination and default MulParams<int32,int32>, computes the exact
// int32 accumulation C = A*B with no saturation, multiplier, or
// zero-point (both zero points default to 0 and "when Dst is int32,
// mul_params is unused" — see the reference's own comment at
// qmm/Ruy.inl.cc:105-106).  A scalar triple loop is therefore
// bit-identical, not an approximation.  The float path (used by
// TensorOps when built without BLAS) accumulates in f32 row-major
// order; the harness builds with SLIMT_HAS_BLAS so that path is
// compiled out.
#ifndef CROSSCHECK_SHIM_RUY_H
#define CROSSCHECK_SHIM_RUY_H

#include <cstdint>
#include <cstring>  // Ruy.inl.cc uses std::memcpy via the real ruy.h's transitive includes

namespace ruy {

enum class Order { kRowMajor, kColMajor };

struct Layout {
  int rows = 0;
  int cols = 0;
  Order order = Order::kRowMajor;
};

inline void MakeSimpleLayout(int rows, int cols, Order order, Layout* layout) {
  layout->rows = rows;
  layout->cols = cols;
  layout->order = order;
}

template <typename T>
class Matrix {
 public:
  Layout* mutable_layout() { return &layout_; }
  const Layout& layout() const { return layout_; }
  void set_data(const T* data) { data_ = data; }
  void set_data(T* data) {
    data_ = data;
    mutable_data_ = data;
  }
  const T* data() const { return data_; }
  T* mutable_data() const { return mutable_data_; }

 private:
  Layout layout_;
  const T* data_ = nullptr;
  T* mutable_data_ = nullptr;
};

struct Context {};

template <typename AccumScalar, typename DstScalar>
struct MulParams {};

namespace detail {
template <typename T>
inline const T* element(const Matrix<T>& m, int i, int j) {
  const Layout& l = m.layout();
  return m.data() + (l.order == Order::kRowMajor
                         ? static_cast<long>(i) * l.cols + j
                         : static_cast<long>(j) * l.rows + i);
}
}  // namespace detail

template <typename LhsScalar, typename RhsScalar, typename AccumScalar,
          typename DstScalar>
void Mul(const Matrix<LhsScalar>& lhs, const Matrix<RhsScalar>& rhs,
         const MulParams<AccumScalar, DstScalar>& /*mul_params*/,
         Context* /*context*/, Matrix<DstScalar>* dst) {
  const int m = lhs.layout().rows;
  const int k = lhs.layout().cols;
  const int n = rhs.layout().cols;
  DstScalar* out = dst->mutable_data();
  const Layout& dl = dst->layout();
  for (int i = 0; i < m; ++i) {
    for (int j = 0; j < n; ++j) {
      AccumScalar acc = 0;
      for (int p = 0; p < k; ++p) {
        acc += static_cast<AccumScalar>(*detail::element(lhs, i, p)) *
               static_cast<AccumScalar>(*detail::element(rhs, p, j));
      }
      long idx = dl.order == Order::kRowMajor
                     ? static_cast<long>(i) * dl.cols + j
                     : static_cast<long>(j) * dl.rows + i;
      out[idx] = static_cast<DstScalar>(acc);
    }
  }
}

}  // namespace ruy

#endif  // CROSSCHECK_SHIM_RUY_H
