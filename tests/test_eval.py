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
