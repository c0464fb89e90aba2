/* Minimal PCRE2 declarations for the crosscheck harness.
 *
 * The system ships the real PCRE2 runtime (libpcre2-8.so.0) but not
 * the development header.  This shim declares exactly the subset the
 * reference's Regex.cc / Splitter.cc use, with the REAL pcre2.h
 * constant values, and maps the width-generic names to the _8
 * symbols the same way the real header does (PCRE2_CODE_UNIT_WIDTH
 * is always 8 in the reference, Regex.hh:5).  All matching behavior
 * — JIT, UTF, \R, Unicode property classes — is the genuine PCRE2
 * library, not an emulation.
 */
#ifndef CROSSCHECK_SHIM_PCRE2_H
#define CROSSCHECK_SHIM_PCRE2_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- types ---------------------------------------------------------- */
typedef uint8_t PCRE2_UCHAR;
typedef uint8_t PCRE2_UCHAR8;
typedef const PCRE2_UCHAR* PCRE2_SPTR;
typedef size_t PCRE2_SIZE;

typedef struct pcre2_real_code_8 pcre2_code_8;
typedef struct pcre2_real_match_data_8 pcre2_match_data_8;
typedef struct pcre2_real_compile_context_8 pcre2_compile_context_8;
typedef struct pcre2_real_match_context_8 pcre2_match_context_8;
typedef struct pcre2_real_general_context_8 pcre2_general_context_8;

#define pcre2_code pcre2_code_8
#define pcre2_match_data pcre2_match_data_8
#define pcre2_compile_context pcre2_compile_context_8
#define pcre2_match_context pcre2_match_context_8
#define pcre2_general_context pcre2_general_context_8

/* ---- constants (values verbatim from pcre2.h) ----------------------- */
#define PCRE2_ZERO_TERMINATED (~(PCRE2_SIZE)0)

/* Compile options. */
#define PCRE2_ALLOW_EMPTY_CLASS 0x00000001u
#define PCRE2_AUTO_CALLOUT 0x00000004u
#define PCRE2_CASELESS 0x00000008u
#define PCRE2_DOTALL 0x00000020u
#define PCRE2_MULTILINE 0x00000400u
#define PCRE2_UCP 0x00020000u
#define PCRE2_UTF 0x00080000u

/* Compile-and-match options. */
#define PCRE2_ANCHORED 0x80000000u
#define PCRE2_NO_UTF_CHECK 0x40000000u
#define PCRE2_ENDANCHORED 0x20000000u

/* Newline conventions: values for pcre2_set_newline().  The reference
 * ORs PCRE2_NEWLINE_ANY (=4) into pcre2_compile options
 * (Splitter.cc:132,157), which in real PCRE2 aliases the
 * PCRE2_AUTO_CALLOUT option bit — the shim keeps the real value so
 * that (quirky but harmless) behavior is reproduced, not corrected. */
#define PCRE2_NEWLINE_CR 1
#define PCRE2_NEWLINE_LF 2
#define PCRE2_NEWLINE_CRLF 3
#define PCRE2_NEWLINE_ANY 4
#define PCRE2_NEWLINE_ANYCRLF 5

/* JIT compile options. */
#define PCRE2_JIT_COMPLETE 0x00000001u

/* pcre2_config() codes. */
#define PCRE2_CONFIG_BSR 0
#define PCRE2_CONFIG_JIT 1

/* Selected error codes (negative returns from pcre2_match). */
#define PCRE2_ERROR_NOMATCH (-1)
#define PCRE2_ERROR_PARTIAL (-2)
#define PCRE2_ERROR_UTF8_ERR1 (-3)

/* ---- functions (mapped to the _8 entry points) ---------------------- */
pcre2_code_8* pcre2_compile_8(PCRE2_SPTR pattern, PCRE2_SIZE length,
                              uint32_t options, int* errorcode,
                              PCRE2_SIZE* erroroffset,
                              pcre2_compile_context_8* ccontext);
void pcre2_code_free_8(pcre2_code_8* code);
int pcre2_jit_compile_8(pcre2_code_8* code, uint32_t options);
int pcre2_config_8(uint32_t what, void* where);
int pcre2_get_error_message_8(int errorcode, PCRE2_UCHAR* buffer,
                              PCRE2_SIZE bufflen);
int pcre2_match_8(const pcre2_code_8* code, PCRE2_SPTR subject,
                  PCRE2_SIZE length, PCRE2_SIZE startoffset, uint32_t options,
                  pcre2_match_data_8* match_data,
                  pcre2_match_context_8* mcontext);
pcre2_match_data_8* pcre2_match_data_create_8(uint32_t ovecsize,
                                              pcre2_general_context_8* gcontext);
pcre2_match_data_8* pcre2_match_data_create_from_pattern_8(
    const pcre2_code_8* code, pcre2_general_context_8* gcontext);
void pcre2_match_data_free_8(pcre2_match_data_8* match_data);
PCRE2_SIZE* pcre2_get_ovector_pointer_8(pcre2_match_data_8* match_data);
PCRE2_SIZE pcre2_get_startchar_8(pcre2_match_data_8* match_data);

#define pcre2_compile pcre2_compile_8
#define pcre2_code_free pcre2_code_free_8
#define pcre2_jit_compile pcre2_jit_compile_8
#define pcre2_config pcre2_config_8
#define pcre2_get_error_message pcre2_get_error_message_8
#define pcre2_match pcre2_match_8
#define pcre2_match_data_create pcre2_match_data_create_8
#define pcre2_match_data_create_from_pattern pcre2_match_data_create_from_pattern_8
#define pcre2_match_data_free pcre2_match_data_free_8
#define pcre2_get_ovector_pointer pcre2_get_ovector_pointer_8
#define pcre2_get_startchar pcre2_get_startchar_8

#ifdef __cplusplus
}
#endif

#endif /* CROSSCHECK_SHIM_PCRE2_H */
