// Shim for the cmake-generated export header (GenerateExportHeader
// output, slimt/CMakeLists.txt:97-100).  Static linkage: the
// visibility macro is a no-op.
#ifndef CROSSCHECK_SHIM_SLIMT_EXPORT_HH
#define CROSSCHECK_SHIM_SLIMT_EXPORT_HH

#define SLIMT_EXPORT
#define SLIMT_NO_EXPORT

#endif  // CROSSCHECK_SHIM_SLIMT_EXPORT_HH
