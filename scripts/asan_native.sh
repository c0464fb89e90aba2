#!/usr/bin/env bash
# AddressSanitizer run of the native host library (the analog of the
# reference's ASan+UBSan CI smoke test, scripts/ci/ubuntu/02-build.sh).
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
BUILD=$(mktemp -d)
g++ -O1 -g -std=c++17 -fPIC -fsanitize=address,undefined -shared \
    -o "$BUILD/libslimt_host_asan.so" "$ROOT/native/slimt_host.cpp"
cat > "$BUILD/check.py" <<'EOF'
import sys, os
sys.path.insert(0, os.environ["SLIMT_ROOT"])
import slimt_tpu.native as native
native._LIB_PATH = os.environ["ASAN_LIB"]
native._lib = None; native._build_failed = False
assert native.available()
from slimt_tpu.text.synthetic_vocab import build_vocabulary
py = build_vocabulary(["hello", "world", "test", "héllo"], backend="none")
nat = build_vocabulary(["hello", "world", "test", "héllo"], backend="native")
lines = ["hello world", "  spaces   collapse  ", "héllo zzz", "",
         "x" * 500, "hello " * 300, "punctuation, works. fine?"]
for line in lines:
    assert py.encode(line) == nat.encode(line), line[:40]
    ids = py.encode(line)[0] + [py.eos_id]
    assert py.decode(ids) == nat.decode(ids)
print(f"ASan/UBSan parity OK over {len(lines)} inputs")
EOF
LD_PRELOAD="$(g++ -print-file-name=libasan.so)" \
    ASAN_OPTIONS=detect_leaks=0 \
    SLIMT_ROOT="$ROOT" ASAN_LIB="$BUILD/libslimt_host_asan.so" \
    python "$BUILD/check.py"
rm -rf "$BUILD"
