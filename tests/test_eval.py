from bella_tpu.eval import evaluate_sets, load_truth, parse_bella, parse_paf, truth_pairs


def test_truth_pairs_basic(tmp_path):
    t = tmp_path / "truth.txt"
    t.write_text(
        "ref r1 0 5000\n"
        "ref r2 2000 7000\n"   # overlaps r1 by 3000
        "ref r3 4500 9000\n"   # overlaps r2 by 2500, r1 by 500
        "other r4 0 3000\n"    # different ref: no pairs
    )
    G = truth_pairs(load_truth(str(t)), min_overlap=2000)
    assert ("r1", "r2") in G and ("r2", "r1") in G
    assert ("r2", "r3") in G and ("r3", "r2") in G
    assert ("r1", "r3") not in G
    assert len(G) == 4


def test_simulated_truth_format(tmp_path):
    t = tmp_path / "truth.txt"
    t.write_text("ref 0 5000 r1\nref 2000 7000 r2\n")
    G = truth_pairs(load_truth(str(t), simulated=True), min_overlap=2000)
    assert ("r1", "r2") in G


def test_evaluate_metrics():
    G = {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}
    S = {("a", "b"), ("c", "d")}
    m = evaluate_sets(S, G, duplicate=True)
    assert m.num_true_positive == 1
    assert abs(m.recall - 50.0) < 1e-6     # 2*1/4
    assert abs(m.precision - 50.0) < 1e-6  # 1/2


def test_parse_bella_formats(tmp_path):
    p = tmp_path / "out.m4"
    p.write_text(
        # 12-col aligned row, ov 3000
        "r1\tr2\t5\t2800\t3000\tn\t0\t10\t100\t0\t10\t100\n"
        # 12-col below min overlap -> dropped
        "r1\tr3\t5\t100\t150\tn\t0\t10\t100\t0\t10\t100\n"
        # 6-col skip-alignment row
        "r4\tr5\t7\t2500\t4000\t4000\n"
    )
    S = parse_bella(str(p), min_overlap=2000)
    assert S == {("r1", "r2"), ("r4", "r5")}
    S_all = parse_bella(str(p), require_overlap=False)
    assert ("r1", "r3") in S_all


def test_parse_paf(tmp_path):
    p = tmp_path / "out.paf"
    # 5000-len reads fully overlapping
    p.write_text("r1\t5000\t0\t4900\t+\tr2\t5000\t50\t4950\t4800\t4900\t255\n")
    S = parse_paf(str(p))
    assert S == {("r1", "r2")}


# ----------------------------------------------------------------------
# Golden fixtures for every parser + translator (benchmark/evaluation.h
# :171-589 and benchmark/lostintranslation.cpp/h equivalents)
# ----------------------------------------------------------------------

def test_parse_mhap_golden(tmp_path):
    from bella_tpu.eval.evaluate import parse_mhap
    p = tmp_path / "out.mhap"
    p.write_text(
        # id1 id2 err sharedmin s1 b1 e1 l1 s2 b2 e2 l2 ; ov = 0+0+(3000+3000)/2
        "r1 r2 0.2 30 0 0 3000 3000 0 0 3000 3000\n"
        "r1 r3 0.2 30 0 0 500 3000 1 2500 3000 3000\n"  # ov 500 -> dropped
        "r4 r4 0.2 30 0 0 3000 3000 0 0 3000 3000\n"    # self pair -> dropped
    )
    assert parse_mhap(str(p)) == {("r1", "r2")}


def test_parse_blasr_golden(tmp_path):
    from bella_tpu.eval.evaluate import parse_blasr
    p = tmp_path / "out.blasr"
    p.write_text(
        # q t score pctsim qstrand qs qe ql tstrand ts te tl (names get /0_len)
        "r1/0_3000 r2/0_3000 -5000 85.0 0 0 2900 3000 0 50 2950 3000\n"
        "r1/0_3000 r3/0_3000 -100 85.0 0 2900 3000 3000 0 0 100 3000\n"  # 100bp dovetail
    )
    assert parse_blasr(str(p)) == {("r1", "r2")}


def test_parse_mecat_golden(tmp_path):
    from bella_tpu.eval.evaluate import parse_mecat
    idx = tmp_path / "idx2read"
    idx.write_text("0 >r1\npath1\n1 >r2\npath2\n2 >r3\npath3\n")
    p = tmp_path / "out.mecat"
    p.write_text(
        "0 1 98.0 30 0 0 2900 3000 0 0 2900 3000\n"
        "0 2 98.0 30 0 2900 3000 3000 0 0 100 3000\n"  # 100bp dovetail -> dropped
    )
    assert parse_mecat(str(p), str(idx)) == {("r1", "r2")}


def test_parse_daligner_golden(tmp_path):
    from bella_tpu.eval.evaluate import parse_daligner
    p = tmp_path / "out.las"
    p.write_text("1 2 n 0 2900 3000 0 2900 3000\n3 3 n 0 10 20 0 10 20\n")
    assert parse_daligner(str(p)) == {("1", "2")}


def test_translators_golden(tmp_path):
    """Every translator emits valid PAF that parse_paf accepts."""
    from bella_tpu.eval.translate import (
        bella_to_paf, blasr_to_paf, daligner_to_paf, mecat_to_paf, mhap_to_paf,
    )
    from bella_tpu.eval.evaluate import parse_paf

    cases = {
        "bella": list(bella_to_paf(
            ["r1\tr2\t5\t2700\t3000\tc\t0\t2900\t3000\t0\t2900\t3000\n"]
        )),
        "mhap": list(mhap_to_paf(
            ["r1 r2 0.2 30 0 0 2900 3000 1 0 2900 3000\n"]
        )),
        "blasr": list(blasr_to_paf(
            ["r1 r2 -5000 85.0 0 0 2900 3000 1 0 2900 3000\n"]
        )),
        "mecat": list(mecat_to_paf(
            ["0 1 98.0 30 0 0 2900 3000 0 0 2900 3000\n"],
            {"0": "r1", "1": "r2"},
        )),
        "daligner": list(daligner_to_paf(
            ["r1 r2 c 0 2900 3000 0 2900 3000\n"]
        )),
    }
    for fmt, rows in cases.items():
        assert len(rows) == 1, fmt
        f = rows[0].rstrip("\n").split("\t")
        assert len(f) == 12, (fmt, f)
        assert f[4] in "+-", fmt
        out = tmp_path / f"{fmt}.paf"
        out.write_text(rows[0])
        assert parse_paf(str(out)) == {(f[0], f[5])}, fmt
    # DALIGNER strand mapping + score estimate ((1-0.15)^2 * ovlen)
    d = cases["daligner"][0].split("\t")
    assert d[4] == "-" and int(d[9]) == int(0.85 * 0.85 * int(d[10]))


def test_translate_cli_daligner(tmp_path):
    from bella_tpu.eval.translate import main as tmain
    src = tmp_path / "in.las"
    src.write_text("r1 r2 n 0 2900 3000 100 2950 3000\n")
    dst = tmp_path / "out.paf"
    tmain(["--format", "daligner", str(src), str(dst)])
    f = dst.read_text().split("\t")
    assert f[4] == "+" and len(f) == 12


def test_eval_cli_main(tmp_path, capsys):
    """The evaluator CLI (role of the reference `result` binary,
    benchmark/evaluation.cpp) scores an M4 file against truth."""
    from bella_tpu.eval.evaluate import main as emain

    t = tmp_path / "truth.txt"
    t.write_text("ref r1 0 5000\nref r2 2000 7000\nref r3 20000 30000\n")
    out = tmp_path / "out.m4"
    out.write_text(
        "r1\tr2\t5\t2800\t3000\tn\t0\t2900\t5000\t2000\t4900\t5000\n"
        "r1\tr3\t5\t2800\t3000\tn\t0\t2900\t5000\t0\t2900\t10000\n"  # false positive
    )
    emain(["-G", str(t), "-B", str(out)])
    cap = capsys.readouterr().out
    assert "bella:" in cap and "RC=100.00%" in cap and "PR=50.00%" in cap
