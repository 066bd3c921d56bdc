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
