// Minimal sentencepiece shim for the crosscheck harness.
//
// The reference vendors browsermt sentencepiece as an
// (un-checked-out) submodule.  The harness feeds PRE-TOKENIZED ids,
// so text Encode/Decode is never exercised — but the reference's
// Vocabulary.cc, Shortlist.cc and Transformer.cc must compile
// verbatim.  This shim provides exactly the API surface
// /root/reference/slimt/Vocabulary.cc uses:
//   - SentencePieceProcessor::{LoadFromSerializedProto, Load, Encode,
//     Decode, pad_id, eos_id, GetPieceSize}
//   - SentencePieceText with pieces()/text()
//   - absl::string_view (aliased to std::string_view)
//
// LoadFromSerializedProto is a real (minimal) SPM ModelProto wire
// parser: it counts `pieces` (field 1) for GetPieceSize() and reads
// TrainerSpec (field 2) varints unk_id/bos_id/eos_id/pad_id
// (fields 40-43, int32 two's complement), with spm's defaults
// (0/1/2/-1) when absent.  Encode/Decode abort: the harness is ids-in
// / ids-out by design (tokenizer parity is tested separately in
// Python against the HF `tokenizers` unigram implementation).
#ifndef CROSSCHECK_SHIM_SENTENCEPIECE_PROCESSOR_H
#define CROSSCHECK_SHIM_SENTENCEPIECE_PROCESSOR_H

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <string_view>
#include <vector>

namespace absl {
using string_view = std::string_view;
}  // namespace absl

namespace sentencepiece {

class SentencePieceText {
 public:
  class Piece {
   public:
    int id() const { return id_; }
    uint32_t begin() const { return begin_; }
    uint32_t end() const { return end_; }
    int id_ = 0;
    uint32_t begin_ = 0;
    uint32_t end_ = 0;
  };

  const std::vector<Piece>& pieces() const { return pieces_; }
  const std::string& text() const { return text_; }

  std::vector<Piece> pieces_;
  std::string text_;
};

class SentencePieceProcessor {
 public:
  void LoadFromSerializedProto(absl::string_view serialized) {
    parse_model_proto(serialized);
  }

  void Load(const std::string& fpath) {
    FILE* f = std::fopen(fpath.c_str(), "rb");
    if (!f) {
      std::fprintf(stderr, "spm shim: cannot open %s\n", fpath.c_str());
      std::abort();
    }
    std::string buffer;
    char chunk[1 << 16];
    size_t n = 0;
    while ((n = std::fread(chunk, 1, sizeof(chunk), f)) > 0) {
      buffer.append(chunk, n);
    }
    std::fclose(f);
    parse_model_proto(buffer);
  }

  void Encode(absl::string_view /*line*/, SentencePieceText* /*out*/) const {
    std::fprintf(stderr, "spm shim: Encode is not available (ids-only harness)\n");
    std::abort();
  }

  void Decode(const std::vector<int>& /*ids*/, SentencePieceText* out) const {
    // Reached only from slimt's disabled topk_inspect debug path
    // (Transformer.cc:300 `if (false)`); return an empty text.
    out->pieces_.clear();
    out->text_.clear();
  }

  int pad_id() const { return pad_id_; }
  int eos_id() const { return eos_id_; }
  int bos_id() const { return bos_id_; }
  int unk_id() const { return unk_id_; }
  int GetPieceSize() const { return piece_count_; }

 private:
  // --- SPM ModelProto wire-format subset ------------------------------
  static bool read_varint(const uint8_t*& p, const uint8_t* end,
                          uint64_t* value) {
    uint64_t result = 0;
    int shift = 0;
    while (p < end && shift < 64) {
      uint8_t byte = *p++;
      result |= static_cast<uint64_t>(byte & 0x7F) << shift;
      if (!(byte & 0x80)) {
        *value = result;
        return true;
      }
      shift += 7;
    }
    return false;
  }

  static bool skip_field(const uint8_t*& p, const uint8_t* end, uint64_t wire) {
    uint64_t tmp = 0;
    switch (wire) {
      case 0:  // varint
        return read_varint(p, end, &tmp);
      case 1:  // fixed64
        if (end - p < 8) return false;
        p += 8;
        return true;
      case 2:  // length-delimited
        if (!read_varint(p, end, &tmp) || static_cast<uint64_t>(end - p) < tmp)
          return false;
        p += tmp;
        return true;
      case 5:  // fixed32
        if (end - p < 4) return false;
        p += 4;
        return true;
      default:
        return false;
    }
  }

  void parse_trainer_spec(const uint8_t* p, const uint8_t* end) {
    while (p < end) {
      uint64_t tag = 0;
      if (!read_varint(p, end, &tag)) return;
      uint64_t field = tag >> 3;
      uint64_t wire = tag & 0x7;
      if (wire == 0 && field >= 40 && field <= 43) {
        uint64_t v = 0;
        if (!read_varint(p, end, &v)) return;
        int32_t value = static_cast<int32_t>(v);  // two's complement int32
        switch (field) {
          case 40: unk_id_ = value; break;
          case 41: bos_id_ = value; break;
          case 42: eos_id_ = value; break;
          case 43: pad_id_ = value; break;
        }
      } else if (!skip_field(p, end, wire)) {
        return;
      }
    }
  }

  void parse_model_proto(std::string_view serialized) {
    const uint8_t* p = reinterpret_cast<const uint8_t*>(serialized.data());
    const uint8_t* end = p + serialized.size();
    piece_count_ = 0;
    while (p < end) {
      uint64_t tag = 0;
      if (!read_varint(p, end, &tag)) break;
      uint64_t field = tag >> 3;
      uint64_t wire = tag & 0x7;
      if (field == 1 && wire == 2) {  // repeated SentencePiece pieces
        uint64_t len = 0;
        if (!read_varint(p, end, &len) ||
            static_cast<uint64_t>(end - p) < len)
          break;
        p += len;
        ++piece_count_;
      } else if (field == 2 && wire == 2) {  // TrainerSpec
        uint64_t len = 0;
        if (!read_varint(p, end, &len) ||
            static_cast<uint64_t>(end - p) < len)
          break;
        parse_trainer_spec(p, p + len);
        p += len;
      } else if (!skip_field(p, end, wire)) {
        break;
      }
    }
  }

  int piece_count_ = 0;
  // sentencepiece TrainerSpec defaults.
  int unk_id_ = 0;
  int bos_id_ = 1;
  int eos_id_ = 2;
  int pad_id_ = -1;
};

}  // namespace sentencepiece

#endif  // CROSSCHECK_SHIM_SENTENCEPIECE_PROCESSOR_H
