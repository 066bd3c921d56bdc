from bella_tpu.eval.evaluate import (
    Metrics,
    evaluate_sets,
    load_truth,
    truth_pairs,
    parse_bella,
    parse_paf,
    parse_mhap,
    parse_blasr,
    parse_daligner,
    parse_mecat,
)

__all__ = [
    "Metrics",
    "evaluate_sets",
    "load_truth",
    "truth_pairs",
    "parse_bella",
    "parse_paf",
    "parse_mhap",
    "parse_blasr",
    "parse_daligner",
    "parse_mecat",
]
