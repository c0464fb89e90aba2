"""Minimal darts-clone double-array builder — TEST HELPER ONLY.

Builds a `precompiled_charsmap` blob (u32 trie byte size + darts units
+ NUL-separated replacement pool) from a {bytes: str} rule map, in the
unit encoding darts-clone's commonPrefixSearch reads (and therefore
sentencepiece and HF tokenizers' normalizers.Precompiled):

    label(unit)    = unit & 0x800000FF   (must equal the byte)
    has_leaf(unit) = (unit >> 8) & 1
    offset(unit)   = (unit >> 10) << ((unit & 0x200) >> 6)
    child at       node_pos ^ offset ^ byte
    value unit at  child slot 0, bit 31 set, value = unit & 0x7FFFFFFF

Used to synthesize charsmaps for parity tests between the native C++
normalizer, HF's Precompiled, and the pure-Python reader — real blobs
(e.g. nmt_nfkc) are not downloadable in this environment.
"""

import struct


def build_charsmap(rules: dict) -> bytes:
    """rules: {key bytes: replacement str} → precompiled charsmap blob."""
    pool = bytearray()
    values = {}
    for key, replacement in rules.items():
        values[key] = len(pool)
        pool += replacement.encode("utf-8") + b"\0"

    # trie of dicts: node = {byte: child}, "" key marks terminal value
    root: dict = {}
    for key, _ in rules.items():
        node = root
        for b in key:
            node = node.setdefault(b, {})
        node[""] = values[key]

    units = [0]  # root placeholder
    used = {0}

    def place(node_pos: int, node: dict) -> int:
        """Allocate child slots for `node`, write child units, recurse.
        Returns the offset stored in the parent unit."""
        labels = sorted(c for c in node if c != "")
        slots = list(labels)
        if "" in node:
            slots.append(0)  # value unit at child label 0
        offset = 1
        while True:
            positions = [node_pos ^ offset ^ c for c in slots]
            if all(p not in used and p != 0 for p in positions):
                break
            offset += 1
        for p in positions:
            used.add(p)
            while p >= len(units):
                units.append(0)
        if "" in node:
            units[node_pos ^ offset ^ 0] = 0x80000000 | node[""]
        for c in labels:
            child_pos = node_pos ^ offset ^ c
            child = node[c]
            child_offset = place(child_pos, child) if any(
                k != "" or True for k in child
            ) else 0
            unit = (child_offset << 10) | c
            if "" in child:
                unit |= 0x100  # has_leaf
            assert child_offset < (1 << 21), "offset too large for tests"
            units[child_pos] = unit
        return offset

    root_offset = place(0, root)
    units[0] = root_offset << 10
    trie = b"".join(struct.pack("<I", u) for u in units)
    return struct.pack("<I", len(trie)) + trie + bytes(pool)


def charsmap_lookup(blob: bytes, data: bytes, pos: int):
    """Pure-Python longest-match over a charsmap blob: returns
    (matched byte length, replacement str) or (0, None). The reference
    reader for tests and the py-backend normalizer."""
    (trie_bytes,) = struct.unpack_from("<I", blob, 0)
    units = memoryview(blob)[4 : 4 + trie_bytes].cast("I")
    pool = memoryview(blob)[4 + trie_bytes :]
    n = len(units)

    def offset(u):
        return (u >> 10) << ((u & 0x200) >> 6)

    node = offset(units[0])
    best_len, best_val = 0, None
    for i in range(pos, len(data)):
        nxt = node ^ data[i]
        if nxt >= n:
            break
        unit = units[nxt]
        if (unit & 0x800000FF) != data[i]:
            break
        node = nxt ^ offset(unit)
        if (unit & 0x100) and node < n:
            best_len = i - pos + 1
            best_val = units[node] & 0x7FFFFFFF
    if best_len == 0:
        return 0, None
    end = bytes(pool).index(b"\0", best_val)
    return best_len, bytes(pool[best_val:end]).decode("utf-8")
