from plr2_tpu.refine.iterative import initial_pose, iterative_refine  # noqa: F401
