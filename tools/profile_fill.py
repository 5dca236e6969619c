"""A/B the compressed-mode fill regression (BENCH r5 prep): default vs
GOLDRUSH_NO_PREWARM on the bench dataset/settings.  Run on the chip.

Usage: python tools/profile_fill.py [variant ...]
  variants: default noprewarm   (each runs warm + fresh measure)
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def run(tag):
    workdir = tempfile.mkdtemp(prefix=f"profill_{tag}_")
    reads = bench.make_dataset(workdir)
    t0 = time.time()
    r = bench.measure_engine(reads, workdir, tag, frame_stride=8,
                             probe_seeds=1, recheck="optimistic",
                             batch_reads=64, mibf_mode="compressed")
    print(f"[{tag}] wall {time.time()-t0:.1f}s  {r}", flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["default", "noprewarm"]
    for v in variants:
        os.environ.pop("GOLDRUSH_NO_PREWARM", None)
        os.environ.pop("GOLDRUSH_RANKSCAN", None)
        if v == "noprewarm":
            os.environ["GOLDRUSH_NO_PREWARM"] = "1"
        elif v == "rankscan":
            os.environ["GOLDRUSH_RANKSCAN"] = "1"
        run(v)
