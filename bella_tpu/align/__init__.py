from bella_tpu.align.xdrop import extend_batch, align_candidates, AlignmentResult

__all__ = ["extend_batch", "align_candidates", "AlignmentResult"]
