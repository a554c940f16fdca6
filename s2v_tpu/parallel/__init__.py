from s2v_tpu.parallel.mesh import make_mesh, shard_frames  # noqa: F401
