from bella_tpu.parallel.sharded import make_mesh, sharded_candidates

__all__ = ["make_mesh", "sharded_candidates"]
