"""Same-process A/B of decode-step variants at serving batch (TPU).

VERDICT r3 task 6: the two components measurably off their floors.
  packed_kernel — the fused logits+packed-key Pallas epilogue
                  (SLIMT_TPU_FUSED_ARGMAX=1 + packed_fp16; the key
                  fold rides the projection epilogue as one s32
                  carry) vs XLA's fused projection+packed reduce.
  fused_blocks  — FFN/SSRU whole-block Pallas kernels in-loop
                  (provider="fused") vs XLA fusion.

Each case is interleaved with a paired default measurement (tunnel
drift discipline); slope method via bench._step_slope_us (RTT and
encoder cancel).

Run: python scripts/ubench_step_ab.py  [UB_B=2048 UB_ROUNDS=3]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

B = int(os.environ.get("UB_B", 2048))
ROUNDS = int(os.environ.get("UB_ROUNDS", 3))

# (label, base_env, variant_env). The packed-kernel case compares
# bf16 keys on BOTH sides: f32->f16 conversion does not legalize in
# this Mosaic version (tpu.pack_subelements), and the key dtype is
# speed-irrelevant (identical op shapes) — the A/B answers whether
# fusing the key fold into a Pallas projection beats XLA's fusion.
CASES = [
    (
        "packed_kernel",
        {"BENCH_ARGMAX": "packed_bf16"},
        {"BENCH_ARGMAX": "packed_bf16", "SLIMT_TPU_FUSED_ARGMAX": "1"},
    ),
    ("fused_blocks", {}, {"BENCH_PROVIDER": "fused"}),
    # Integer-accumulator-domain argmax (VERDICT r4 task 4): the float
    # epilogue (i32→f32, scale, bias, fp16 round, bitcast, sortable
    # map) collapses to one integer add+shift before the same single
    # s32 reduce. Full-vocab and the serving shortlist width.
    (
        "packed_int",
        {"BENCH_ARGMAX": "packed_fp16"},
        {"BENCH_ARGMAX": "packed_int"},
    ),
    (
        "packed_int_sl",
        {"BENCH_ARGMAX": "packed_fp16", "BENCH_SHORTLIST": "1024"},
        {"BENCH_ARGMAX": "packed_int", "BENCH_SHORTLIST": "1024"},
    ),
]
if len(sys.argv) > 1:
    wanted = sys.argv[1].split(",")
    CASES = [c for c in CASES if any(w in c[0] for w in wanted)]


def med(v):
    return sorted(v)[len(v) // 2]


def main():
    def with_env(env, fn):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            return fn()
        finally:
            for k, old in saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old

    results = {label: ([], []) for label, _, _ in CASES}
    for r in range(ROUNDS):
        for label, base_env, variant_env in CASES:
            us = with_env(
                base_env,
                lambda: bench._step_slope_us(batch=B, seq=64, iters=8)[0],
            )
            us_v = with_env(
                variant_env,
                lambda: bench._step_slope_us(batch=B, seq=64, iters=8)[0],
            )
            results[label][0].append(us)
            results[label][1].append(us_v)
            print(
                f"round {r}: {label} base {us:.1f} us/step, "
                f"variant {us_v:.1f}",
                flush=True,
            )
    print(f"\nB={B} median over {ROUNDS} paired rounds:")
    for label, _, _ in CASES:
        base, var = results[label]
        print(
            f"  {label:13s} base {med(base):7.1f} -> variant "
            f"{med(var):7.1f} us/step"
        )


if __name__ == "__main__":
    main()
