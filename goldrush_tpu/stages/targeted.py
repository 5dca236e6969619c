"""GoldPolish-Target equivalent: polish only gap-filled / joined regions.

The reference runs ``goldpolish --target --k-ntlink 88 --w-ntlink 1000 -l 64``
as the final stage (bin/goldrush:305-308): only the sequence inserted by
ntLink gap filling (plus a 64 bp flank) is re-polished, since the rest of the
assembly was already polished upstream.

Here the filled-region coordinates flow directly from the ntLink-equivalent
stage, each region (+flank) is excised, polished with the same site-parallel
k-mer polisher, and spliced back.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import polish as polish_mod
from .ntlink import Scaffold


@dataclass
class TargetParams:
    flank: int = 64          # -l
    k: int = 24
    solid_min: int = 2
    rounds: int = 8
    # gap fills are raw read sequence (~5-10% error): dense clusters need a
    # small-k-first schedule — small k localizes inside clusters where a
    # 24-mer window never goes clean, larger k refines (measured 0.42 ->
    # 0.91 truth 21-mer identity on synthetic 5%-error fills vs 0.66 for
    # single-k; tools/downstream_validate.py)
    schedule: tuple = ((13, 12), (17, 12), (24, 8))


def polish_targets(scaffolds: list[Scaffold], reads: list[bytes],
                   p: TargetParams | None = None
                   ) -> tuple[list[tuple[str, bytes]], int]:
    p = p or TargetParams()
    pp = polish_mod.PolishParams(k=p.k, solid_min=p.solid_min,
                                 rounds=p.rounds, schedule=p.schedule)
    tables: dict = {}
    out = []
    total_edits = 0
    for sc in scaffolds:
        if not sc.filled:
            out.append((sc.name, sc.seq.upper()))
            continue
        seq = sc.seq
        # process regions right-to-left so earlier coordinates stay valid
        regions = sorted(sc.filled, key=lambda r: -r[0])
        for r0, r1 in regions:
            a = max(r0 - p.flank, 0)
            b = min(r1 + p.flank, len(seq))
            window = seq[a:b].upper()
            fixed, ne = polish_mod.polish_seq(window, reads, pp, tables)
            total_edits += ne
            seq = seq[:a] + fixed + seq[b:]
        out.append((sc.name, seq.upper()))
    return out, total_edits
