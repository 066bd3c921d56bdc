from bella_tpu.overlap.pairs import CandidatePairs, generate_candidates

__all__ = ["CandidatePairs", "generate_candidates"]
