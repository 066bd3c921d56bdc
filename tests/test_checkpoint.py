import numpy as np

from bella_tpu import BellaConfig
from bella_tpu.io.matrixdump import dump_matrix_market, load_checkpoint, save_checkpoint
from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.kmers import build_reliable_triples, extract_occurrences
from bella_tpu.pipeline import run_pipeline


def _sim():
    g = random_genome(6000, seed=41)
    reads, _ = sample_reads(g, 20, mean_len=900, min_len=400, error_rate=0.1, seed=42)
    return reads


def test_checkpoint_roundtrip(tmp_path):
    reads = _sim()
    cfg = BellaConfig()
    tri = build_reliable_triples(reads, cfg, extract_occurrences(reads, cfg))
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, tri)
    tri2 = load_checkpoint(p)
    assert tri2.num_kmers == tri.num_kmers and tri2.nnz == tri.nnz
    assert np.array_equal(tri2.kmer_ids, tri.kmer_ids)
    assert np.array_equal(tri2.positions, tri.positions)


def test_pipeline_resume_matches(tmp_path):
    reads = _sim()
    ck = str(tmp_path / "c.npz")
    cfg1 = BellaConfig(skip_alignment=True, checkpoint=ck)
    r1 = run_pipeline(reads, cfg1, str(tmp_path / "a.out"))
    # resume run: counting skipped, identical output
    cfg2 = BellaConfig(skip_alignment=True, checkpoint=ck)
    r2 = run_pipeline(reads, cfg2, str(tmp_path / "b.out"))
    assert open(tmp_path / "a.out").read() == open(tmp_path / "b.out").read()


def test_matrix_dump(tmp_path):
    reads = _sim()
    cfg = BellaConfig()
    tri = build_reliable_triples(reads, cfg, extract_occurrences(reads, cfg))
    p = str(tmp_path / "m.mtx")
    dump_matrix_market(p, tri)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("%%MatrixMarket")
    dims = lines[1].split()
    assert int(dims[0]) == reads.num_reads
    assert int(dims[2]) == tri.nnz
    assert len(lines) == 2 + tri.nnz
