#!/usr/bin/env python3
"""Compare an idle Bench capture to a stressed one (scripts/chaos_bench.sh).

Pass criterion (VERDICT r14 #1): >= 95% of query keys in the stressed
capture land within the normal band of the idle capture, where the
normal band is ratio <= 1.5x OR absolute delta <= 0.3s (sub-second keys
jitter by scheduler granularity even on an idle host; the r14 windowed
keys read 3-30x, far outside either bound).
"""
import json
import sys

RATIO_BAND = 1.5
ABS_BAND = 0.3


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in d["queries"].items()
            if k.startswith("q_") and v >= 0}


def main(idle_path, stressed_path):
    idle, stressed = load(idle_path), load(stressed_path)
    common = sorted(set(idle) & set(stressed))
    if not common:
        print("no common keys")
        return 1
    bad = []
    for k in common:
        i, s = idle[k], stressed[k]
        ratio = s / i if i > 0 else float("inf")
        in_band = ratio <= RATIO_BAND or abs(s - i) <= ABS_BAND
        mark = "ok  " if in_band else "BLOWN"
        print(f"{mark} {k}: idle={i:.3f}s stressed={s:.3f}s ratio={ratio:.2f}")
        if not in_band:
            bad.append(k)
    frac = 1 - len(bad) / len(common)
    print(f"\n{len(common) - len(bad)}/{len(common)} keys in band "
          f"({frac:.1%}; need >= 95%)")
    if frac < 0.95:
        print(f"CHAOS CHECK FAILED: {bad}")
        return 1
    print("CHAOS CHECK PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
