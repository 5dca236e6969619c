"""Quality gate for the shipped throughput-mode defaults.

The bench/production sampled configuration (frame_stride=8, probe_seeds=1,
scatter-max insert over all 3 seeds, full-resolution trim recheck,
optimistic recheck) must stay within a bounded recruit-set drift of the
exact engine on a realistic dataset (1 Mbp, 5% error, 40% indels — the
scale where the derived filter sizing is out of the tiny-genome degenerate
regime, see .claude/skills/verify/SKILL.md).

Measured operating points (round 4, tools/calib_gate.py on this exact
dataset):

  shipped (stride 8, ps 1, ins 3, recheck)        Jaccard 0.912
  stride curve with recheck: s1/s2/s4/s8 = 0.923 / 0.889 / 0.878 / 0.912
  agreement floor of ANY scatter-max mode         0.906
    (= the EXACT classifier — stride 1, all seeds — run with only the
    max-id-wins insert + optimistic batching: the reservoir-winner
    sensitivity of borderline trim decisions cascades through the filter
    state; the reference accepts the same nondeterminism class across
    thread interleavings, MIBloomFilter.hpp:105-107)

So the whole stride curve sits within +-0.02 of the insert-rule floor —
sampling no longer costs quality beyond that floor (round 3's pathologies,
0.44 cliffs at probe_seeds=0-sampled and 1-seed-insert flank distortion,
are fixed by the all-seed insert + trim recheck).  Gate at 0.90 for the
shipped config; full fidelity is the exact mode (bit-identical to the
compiled reference, test_ref_parity).
"""

import os

import pytest

import tests.conftest  # noqa: F401
from goldrush_tpu.config import PathConfig
from goldrush_tpu.io import fastq
from goldrush_tpu.path.engine import GoldenPathEngine
from goldrush_tpu.utils import synth

PRESET = "1011011110110111101101"
G = 1_000_000


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("qgate")
    genome = synth.random_genome(G, seed=51)
    reads = synth.simulate_reads(genome, 600, 20_000, seed=52,
                                 err_rate=0.05, indel_frac=0.4)
    fqp = str(d / "reads.fq")
    synth.write_fastq(fqp, reads)
    return d, fqp


def _run(d, fqp, tag, **over):
    cfg = PathConfig(input=fqp, genome_size=G, kmer_size=22, weight=16,
                     hash_num=3, seed_preset=PRESET, silver_path=True,
                     max_paths=3, ratio=0.75, min_length=15_000,
                     prefix_file=str(d / tag), batch_reads=64, **over)
    GoldenPathEngine(cfg).run()
    ids = set()
    lens = []
    for i in (1, 2, 3):
        p = str(d / f"{tag}_{i}.fq")
        if os.path.exists(p):
            for r in fastq.read_records(p):
                ids.add(r.id.rsplit("_", 1)[0])
                lens.append(len(r.seq))
    return ids, lens


def test_shipped_throughput_defaults_quality(dataset):
    d, fqp = dataset
    base, base_lens = _run(d, fqp, "exact")      # exact defaults
    ids, lens = _run(d, fqp, "prod", frame_stride=8, probe_seeds=1,
                     recheck="optimistic")
    assert base, "exact anchor recruited nothing"
    jac = len(ids & base) / max(len(ids | base), 1)
    assert jac >= 0.90, f"recruit-set Jaccard {jac:.3f} below gate"
    # assembly-level invariant: silver fill stays ~= r*G*M
    fill = sum(lens) / (0.75 * G * 3)
    assert 0.9 <= fill <= 1.15, fill
    # the rank-compressed filter (the bench-primary, at-scale mode) makes
    # IDENTICAL decisions: slot->rank is a bijection on present slots, the
    # max-id-wins insert and every vote/gate is keyed the same way
    cids, clens = _run(d, fqp, "prodcz", frame_stride=8, probe_seeds=1,
                       recheck="optimistic", mibf_mode="compressed")
    assert cids == ids, (len(cids - ids), len(ids - cids))


def test_repeat_genome_silver_stage(tmp_path):
    """Silver-path stage on a repeat-structured genome with
    homopolymer-biased ONT-profile errors (tandem + dispersed repeats are
    what the classifier smoothing exists for; uniform-random genomes never
    stress it).  Gates: genome coverage of the recruit set and silver fill
    stay at the reference's operating point (tools/repeat_validate.py runs
    the full-pipeline version of this audit)."""
    import re
    G2 = 1_000_000
    genome = synth.repeat_genome(G2, seed=91)
    reads = synth.simulate_reads(genome, 600, 20_000, seed=92,
                                 err_rate=0.05, indel_frac=0.4,
                                 homopolymer_bias=0.6)
    fqp = str(tmp_path / "reads.fq")
    synth.write_fastq(fqp, reads)
    cfg = PathConfig(input=fqp, genome_size=G2, kmer_size=22, weight=16,
                     hash_num=3, seed_preset=PRESET, silver_path=True,
                     max_paths=3, ratio=0.75, min_length=15_000,
                     prefix_file=str(tmp_path / "rep"), batch_reads=64,
                     frame_stride=8, probe_seeds=1, recheck="optimistic")
    GoldenPathEngine(cfg).run()
    iv = []
    total = 0
    for i in (1, 2, 3):
        p = str(tmp_path / f"rep_{i}.fq")
        if os.path.exists(p):
            for r in fastq.read_records(p):
                total += len(r.seq)
                m = re.search(r"_p(\d+)", r.id)
                if m:
                    s = int(m.group(1))
                    iv.append((s, min(s + len(r.seq), G2)))
    fill = total / (0.75 * G2 * 3)
    assert 0.85 <= fill <= 1.2, fill
    iv.sort()
    covered, end = 0, 0
    for s, e in iv:
        s = max(s, end)
        if e > s:
            covered += e - s
            end = e
    assert covered / G2 >= 0.85, covered / G2
