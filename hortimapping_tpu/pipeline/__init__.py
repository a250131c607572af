"""End-to-end drivers behind the public entry-point scripts.

Reference entry points (repo root of `/root/reference`):
  test_wild_completion.py            -> pipeline.wild.run_wild_completion
  run_shape_completion_challenge.py  -> pipeline.challenge.run_challenge
  eval_lab_single_frame.py           -> pipeline.lab.run_lab_eval(single)
  eval_lab_multi_frames.py           -> pipeline.lab.run_lab_eval(multi)
  eval_wild_single_frame.py          -> pipeline.greenhouse.run_greenhouse_eval(single)
  eval_wild_multi_frames.py          -> pipeline.greenhouse.run_greenhouse_eval(multi)

The TPU-native difference from the reference: drivers gather ALL fruit
instances first (host preprocessing), then run ONE batched fused-LM solve
(`optim.lm.shape_pose_joint_opt_batched`, sharded over a device mesh when
more than one chip is visible), then write outputs — instead of the
reference's sequential per-fruit optimize-write loop.
"""
