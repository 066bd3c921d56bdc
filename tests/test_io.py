import numpy as np

from bella_tpu.io import ReadSet, parse_fastq, parse_fofn, read_files
from bella_tpu.io.simulate import random_genome, sample_reads, write_fastq, write_truth


def test_parse_fastq_roundtrip(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_text(
        "@r1 some description\nACGTACGT\n+\nIIIIIIII\n"
        "@r2\nTTTT\n+\n!!!!\n"
    )
    rs = parse_fastq(str(p))
    assert rs.num_reads == 2
    assert rs.names == ["r1", "r2"]  # description stripped, '@' removed
    assert rs.sequence(0) == "ACGTACGT"
    assert rs.sequence(1) == "TTTT"
    assert list(rs.lengths) == [8, 4]
    # qual '!' = q0 -> error prob 1.0; 'I' = q40 -> 1e-4
    assert rs.err_bases == 12
    assert abs(rs.err_sum - (8 * 1e-4 + 4 * 1.0)) < 1e-9


def test_fofn_and_concat(tmp_path):
    a, b = tmp_path / "a.fastq", tmp_path / "b.fastq"
    a.write_text("@r1\nACGT\n+\nIIII\n")
    b.write_text("@r2\nGGGG\n+\nIIII\n")
    fofn = tmp_path / "in.txt"
    fofn.write_text("a.fastq\nb.fastq\n")
    assert parse_fofn(str(fofn)) == [str(a), str(b)]
    rs = read_files(str(fofn))
    assert rs.num_reads == 2
    assert rs.sequence(1) == "GGGG"


def test_from_sequences():
    rs = ReadSet.from_sequences(["ACGT", "TT"])
    assert rs.num_reads == 2
    assert rs.sequence(0) == "ACGT"


def test_simulator_truth_and_fastq(tmp_path):
    g = random_genome(5000, seed=0)
    reads, truth = sample_reads(g, 10, mean_len=800, min_len=300, error_rate=0.1, seed=1)
    assert reads.num_reads == 10
    assert len(truth) == 10
    for ref, name, s, e in truth:
        assert ref == "genome" and e > s
    fq = tmp_path / "sim.fastq"
    write_fastq(str(fq), reads)
    rs2 = parse_fastq(str(fq))
    assert rs2.num_reads == 10
    assert rs2.sequence(3) == reads.sequence(3)
    write_truth(str(tmp_path / "t.txt"), truth)


def test_zero_error_reads_match_genome():
    g = random_genome(2000, seed=2)
    reads, truth = sample_reads(g, 5, mean_len=500, min_len=200, error_rate=0.0, seed=3, circular=False)
    comp = np.array([3, 2, 1, 0], dtype=np.uint8)
    for r in range(5):
        _, _, s, e = truth[r]
        frag = g[s:e]
        got = reads.codes[reads.offsets[r] : reads.offsets[r + 1]]
        fwd = np.array_equal(got, frag)
        rev = np.array_equal(got, comp[frag[::-1]])
        assert fwd or rev


def test_gzip_ingest_matches_plain(tmp_path):
    """.gz inputs parse identically to plain FASTQ (the reference's
    gzip hooks are compiled out, kmercode/common.h:16 NO_GZIP)."""
    import gzip

    from bella_tpu.io.fastq import parse_fastq
    from bella_tpu.io.simulate import random_genome, sample_reads, write_fastq

    g = random_genome(5000, seed=91)
    reads, _ = sample_reads(g, 20, mean_len=700, min_len=300,
                            error_rate=0.1, seed=92, circular=False)
    plain = tmp_path / "r.fastq"
    write_fastq(str(plain), reads)
    gz = tmp_path / "r.fastq.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    a = parse_fastq(str(plain))
    b = parse_fastq(str(gz))
    assert a.names == b.names
    assert (a.codes == b.codes).all() and (a.offsets == b.offsets).all()
    assert abs(a.err_sum - b.err_sum) < 1e-9 and a.err_bases == b.err_bases


def test_streaming_ingest_budget(tmp_path):
    """A corpus larger than the enforced text budget ingests block-wise
    and matches the unchunked parse (ParallelFASTQ::fill_block parity,
    kmercode/ParallelFASTQ.h:58-89)."""
    from bella_tpu.io.fastq import parse_fastq, stream_fastq
    from bella_tpu.io.simulate import random_genome, sample_reads, write_fastq

    g = random_genome(20000, seed=93)
    reads, _ = sample_reads(g, 60, mean_len=1500, min_len=500,
                            error_rate=0.1, seed=94, circular=False)
    p = tmp_path / "big.fastq"
    write_fastq(str(p), reads)
    whole = parse_fastq(str(p))
    # ~40 KB blocks on a ~200 KB file -> several blocks
    budget = 40 << 10
    blocks = list(stream_fastq(str(p), budget))
    assert len(blocks) > 2
    acc = blocks[0]
    for b in blocks[1:]:
        acc = acc.concat(b)
    assert acc.names == whole.names
    assert (acc.codes == whole.codes).all()
    assert (acc.offsets == whole.offsets).all()
    assert acc.err_bases == whole.err_bases
    # budget-bounded parse through the public entry too
    budgeted = parse_fastq(str(p), block_bytes=budget)
    assert budgeted.names == whole.names and (budgeted.codes == whole.codes).all()


def test_streaming_truncated_record(tmp_path):
    """A trailing partial record is silently dropped (fq_reader parity)."""
    from bella_tpu.io.fastq import parse_fastq

    p = tmp_path / "t.fastq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2\nACG")
    rs = parse_fastq(str(p), block_bytes=1 << 20)
    assert rs.names == ["r1"] and rs.num_reads == 1
