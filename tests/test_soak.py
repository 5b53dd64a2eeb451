"""Trainer+data composition under preemption fire (tiny CPU shape).

Drives apps/soak_v1 end-to-end: synthesize tar shards of real x264 mp4s,
run the REAL apps.train_v1 CLI as a subprocess against them (native decode
-> tiny VAE encode -> jitted LCD step), SIGTERM it mid-run, assert the
graceful final checkpoint, relaunch, and assert the run RESUMES past the
checkpoint instead of restarting at step 0. This is the test-scale version
of the production soak (reference equivalent: the live webdataset loop +
resume-from-latest, train_t2v_turbo_v1_lora.py:812-836,908-933 — which the
reference can only validate by running the real job).
"""

import json

from t2v_turbo_tpu.apps import soak_v1


def test_soak_tiny_sigterm_resume(tmp_path):
    soak_v1.main([
        "--workdir", str(tmp_path), "--tiny",
        "--phase-a-s", "3", "--phase-b-s", "3",
        "--n-shards", "2", "--clips-per-shard", "4",
        "--checkpointing-steps", "50",  # > steps reached: the final save
                                        # must come from the SIGTERM path
    ])
    summary = json.loads((tmp_path / "summary.json").read_text())
    # phase A checkpointed on SIGTERM, phase B resumed strictly past it
    assert summary["ckpt_phase_a"] >= 1
    assert summary["resumed_at_step"] == summary["ckpt_phase_a"] + 1
    assert summary["steps_total"] > summary["ckpt_phase_a"]
    assert 0.0 <= summary["data_wait_frac"] <= 1.0

    # the metrics stream carries the input-bound measurement per window
    rows = [
        json.loads(line)
        for line in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    ]
    assert all("data_wait_frac" in r for r in rows)
