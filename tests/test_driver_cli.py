"""Driver CLI smoke test (train mode, tiny sizes, CPU)."""
import json
import os

import pytest


@pytest.mark.slow
def test_driver_train_smoke(tmp_path):
    from physicsvae_tpu.driver import main
    local = str(tmp_path / "run")
    main(["--mode", "train",
          "--spec", "/root/reference/data/spec/loco/loco_test.yaml",
          "--project_dir", "/root/reference",
          "--num_envs", "2", "--rollout_length", "2", "--num_iter", "2",
          "--checkpoint_freq", "1", "--local_dir", local])
    prog = os.path.join(local, "progress.jsonl")
    rows = [json.loads(l) for l in open(prog)]
    assert len(rows) == 2
    assert "episode_reward_mean" in rows[0]
    assert os.path.isdir(os.path.join(local, "ckpt_final"))
    assert os.path.isdir(os.path.join(local, "trainer_state"))
