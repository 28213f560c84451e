"""Serving pool, event writers, visualizer, TTA plumbing."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_async_batched_predictor_orders_results():
    from uni_encoder_tpu.engine.serving import AsyncBatchedPredictor

    @jax.jit
    def fn(batch):
        return {"y": batch["x"] * 2}

    pred = AsyncBatchedPredictor(fn, batch_size=4, max_wait_s=0.01)
    futs = [pred.submit({"x": np.full((3,), i, np.float32)}) for i in range(10)]
    outs = [f.result(timeout=30) for f in futs]
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o["y"], 2.0 * i)
    pred.shutdown()


def test_event_storage_and_json_writer(tmp_path):
    from uni_encoder_tpu.engine.events import EventStorage, JSONWriter

    storage = EventStorage()
    writer = JSONWriter(str(tmp_path / "metrics.json"))
    for it in range(3):
        storage.put_scalars(loss=1.0 / (it + 1), lr=0.1)
        writer.write(storage)
        storage.step()
    writer.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.json")]
    assert len(lines) == 3
    assert lines[0]["iteration"] == 0 and abs(lines[2]["loss"] - 1 / 3) < 1e-9


def test_mlflow_wandb_writers_gate_gracefully():
    from uni_encoder_tpu.engine.events import EventStorage, MLflowWriter, WandbWriter, setup_mlflow

    storage = EventStorage()
    storage.put_scalar("x", 1.0)
    MLflowWriter().write(storage)  # no mlflow installed: must no-op
    WandbWriter().write(storage)
    assert setup_mlflow("exp", "run") is None


def test_visualizer_renders():
    from uni_encoder_tpu.demo import visualizer as vis

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 48, 3), np.uint8)
    sem = rng.rand(19, 32, 48).astype(np.float32)
    out = vis.draw_sem_seg(img, sem)
    assert out.shape == img.shape and out.dtype == np.uint8

    pan = np.zeros((32, 48), np.int32)
    pan[:, :24] = 1
    pan[:, 24:] = 2
    infos = [
        {"id": 1, "category_id": 0, "isthing": False},
        {"id": 2, "category_id": 13, "isthing": True},
    ]
    out = vis.draw_panoptic(img, pan, infos)
    assert out.shape == img.shape

    masks = np.zeros((2, 32, 48), bool)
    masks[0, :10], masks[1, 20:] = True, True
    out = vis.draw_instances(img, masks, np.array([13, 11]), np.array([0.9, 0.7]))
    assert out.shape == img.shape

    disp = rng.rand(32, 48).astype(np.float32)
    assert vis.colorize_disparity(disp).shape == (32, 48, 3)
    flow = rng.randn(32, 48, 2).astype(np.float32)
    assert vis.flow_to_rgb(flow).shape == (32, 48, 3)


def test_semantic_tta_flip_consistency():
    from uni_encoder_tpu.engine.tta import SemanticTTA

    class FakePredictor:
        def infer_segmentation(self, item):
            h, w = item["height"], item["width"]
            sem = np.zeros((2, h, w), np.float32)
            sem[0, :, : w // 2] = 1.0  # class 0 on the left half
            sem[1, :, w // 2 :] = 1.0
            return {"sem_seg": sem}

    tta = SemanticTTA(FakePredictor(), min_sizes=[16, 24], max_size=64, flip=True)
    item = {"image": np.zeros((16, 32, 3), np.uint8), "height": 16, "width": 32}
    out = tta(item)
    sem = out["sem_seg"]
    # the fake predictor is deterministic in output space; flipped passes are
    # un-flipped, so the average must equal a single pass... except the fake
    # ignores input content — flip symmetry makes left/right swap and average
    assert sem.shape == (2, 16, 32)
    np.testing.assert_allclose(sem[0] + sem[1], 1.0)


def test_bench_gate_decision_file(tmp_path):
    """bench applies hw_session's measured winner as gate DEFAULTS: explicit
    env always wins, BENCH_IGNORE_GATES_FILE opts out, and a missing/corrupt
    file is a no-op (flip-after-green automated; tools/hw_session.sh)."""
    import bench

    p = tmp_path / "gates.json"
    p.write_text(json.dumps({"winner": "gsplit2", "value": 7.145,
                             "gates": {"MSDA_GATHER_SPLIT": "2"}}))

    env = {}
    assert bench._load_gate_defaults(str(p), env)
    assert env == {"MSDA_GATHER_SPLIT": "2"}

    # explicit env wins over the file
    env = {"MSDA_GATHER_SPLIT": "4"}
    assert bench._load_gate_defaults(str(p), env) is False
    assert env == {"MSDA_GATHER_SPLIT": "4"}

    # opt-out for decision-table rows
    env = {"BENCH_IGNORE_GATES_FILE": "1"}
    assert not bench._load_gate_defaults(str(p), env)
    assert "MSDA_GATHER_SPLIT" not in env

    # missing or corrupt file: no-op
    assert not bench._load_gate_defaults(str(tmp_path / "absent.json"), {})
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert not bench._load_gate_defaults(str(bad), {})

    # unknown keys in the file are ignored (only real gate envs applied)
    p.write_text(json.dumps({"gates": {"EVIL_KNOB": "1"}}))
    env = {}
    assert not bench._load_gate_defaults(str(p), env)
    assert env == {}


def test_bench_safe_mode_retry(monkeypatch):
    """bench.main() must fall back exactly once to the pure-XLA gate set
    when a GATED run fails, honor BENCH_NO_RETRY=1, and skip the retry when
    every gate is already off (a byte-identical rerun cannot succeed)."""
    import bench

    # bench.main() mutates os.environ directly; swap in a throwaway copy so
    # nothing leaks into later tests (monkeypatch can only restore vars it
    # itself set)
    monkeypatch.setattr(os, "environ", dict(os.environ))
    # isolate from the repo's real decision file (it applies gate defaults)
    monkeypatch.setattr(bench, "GATES_FILE", "/nonexistent/gates.json")

    calls = []

    def flaky(retried=False):
        calls.append(os.environ.get("MSDA_GATHER_SPLIT"))
        if len(calls) == 1:
            assert not retried
            raise RuntimeError("simulated lowering failure")
        assert retried  # the fallback run must self-identify in its record

    # a gated run retries once with the pure-XLA gate set
    monkeypatch.setenv("MSDA_GATHER_SPLIT", "2")
    monkeypatch.delenv("BENCH_NO_RETRY", raising=False)
    monkeypatch.setattr(bench, "run", flaky)
    bench.main()
    assert calls == ["2", "1"]

    # BENCH_NO_RETRY=1 suppresses the fallback even for a gated run
    calls.clear()
    monkeypatch.setenv("MSDA_GATHER_SPLIT", "2")
    monkeypatch.setenv("BENCH_NO_RETRY", "1")
    with pytest.raises(RuntimeError):
        bench.main()
    assert len(calls) == 1

    # with every gate off (plain single-gather MSDA) the retry would re-run
    # an identical configuration — it must not happen
    calls.clear()
    monkeypatch.delenv("MSDA_GATHER_SPLIT", raising=False)
    monkeypatch.delenv("BENCH_NO_RETRY", raising=False)
    with pytest.raises(RuntimeError):
        bench.main()
    assert len(calls) == 1
