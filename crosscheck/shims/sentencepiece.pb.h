// Shim for the sentencepiece protobuf header.  SentencePieceText is
// already defined in the shim sentencepiece_processor.h (the real
// library declares it here); nothing else from the .pb.h is used by
// the reference's Vocabulary.cc.
#ifndef CROSSCHECK_SHIM_SENTENCEPIECE_PB_H
#define CROSSCHECK_SHIM_SENTENCEPIECE_PB_H

#include "sentencepiece_processor.h"

#endif  // CROSSCHECK_SHIM_SENTENCEPIECE_PB_H
