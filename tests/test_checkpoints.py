"""Orbax checkpoint round-trips: params, retention, partial (LoRA-style)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.io.checkpoints import (
    CheckpointManager,
    load_checkpoint,
    merge_params,
    save_checkpoint,
    trainable_only,
)


def test_save_load_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,), jnp.int32)}}
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, tree)
    restored = load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]), np.asarray(tree["b"]["c"]))
    # typed restore against a target
    restored2 = load_checkpoint(p, target=tree)
    assert restored2["b"]["c"].dtype == jnp.int32


def test_manager_retention_and_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "run"), save_every_steps=1, keep_max=2)
    for step in range(4):
        tree = {"w": jnp.full((2,), float(step))}
        assert mgr.maybe_save(step, tree)
    mgr.close()
    mgr2 = CheckpointManager(str(tmp_path / "run"), save_every_steps=1, keep_max=2)
    latest = mgr2.restore_latest()
    np.testing.assert_array_equal(np.asarray(latest["w"]), [3.0, 3.0])
    mgr2.close()


def test_trainer_ckpt_transform_saves_partial_tree(tmp_path):
    """Trainer(ckpt_transform=trainable_only) writes adapter-only periodic
    checkpoints (the MindPet choice_func save filter in the reference's LoRA
    flow) — the frozen base must not appear in the saved tree."""
    from minddiffusion_tpu.train.loop import Trainer

    class _State:
        def __init__(self):
            self.step = jnp.zeros((), jnp.int32)
            self.params = {"w": jnp.ones((2,)), "lora_a": jnp.full((2,), 5.0)}

    class _Data:
        def epoch(self, i):
            yield {"x": np.zeros((1,))}

    def step_fn(state, batch, rng):
        state.step = state.step + 1
        return state, {"loss": jnp.zeros(())}

    mask = {"w": False, "lora_a": True}
    mgr = CheckpointManager(str(tmp_path / "run"), save_every_steps=1)
    Trainer(step_fn=step_fn, dataset=_Data(), rng=jax.random.PRNGKey(0),
            ckpt_manager=mgr,
            ckpt_transform=lambda p: trainable_only(p, mask)).fit(_State())
    saved = CheckpointManager(str(tmp_path / "run")).restore_latest()
    assert saved.get("w") is None  # frozen base absent from the checkpoint
    np.testing.assert_array_equal(np.asarray(saved["lora_a"]), [5, 5])


def test_partial_lora_checkpoint_roundtrip():
    params = {"unet": {"w": jnp.ones((2,)), "lora_a": jnp.full((2,), 2.0)}}
    mask = {"unet": {"w": False, "lora_a": True}}
    partial = trainable_only(params, mask)
    assert partial["unet"]["w"] is None
    base = {"unet": {"w": jnp.zeros((2,)), "lora_a": jnp.zeros((2,))}}
    merged = merge_params(base, partial)
    np.testing.assert_array_equal(np.asarray(merged["unet"]["w"]), [0, 0])
    np.testing.assert_array_equal(np.asarray(merged["unet"]["lora_a"]), [2, 2])


def test_trainer_skips_transform_on_non_saving_steps(tmp_path):
    """The ckpt_transform must run only when orbax will actually save
    (first step + every save_interval) — not on every hot-loop step."""
    from minddiffusion_tpu.train.loop import Trainer

    calls = []

    class _State:
        def __init__(self):
            self.step = jnp.zeros((), jnp.int32)
            self.params = {"w": jnp.ones((2,))}

    class _Data:
        def epoch(self, i):
            for _ in range(7):
                yield {}

    def step_fn(state, batch, rng):
        return state, {"loss": jnp.zeros(())}

    def spy_transform(p):
        calls.append(1)
        return p

    mgr = CheckpointManager(str(tmp_path / "run"), save_every_steps=3)
    Trainer(step_fn=step_fn, dataset=_Data(), rng=jax.random.PRNGKey(0),
            ckpt_manager=mgr, ckpt_transform=spy_transform).fit(_State())
    # 7 steps, interval 3: saves at step 1 (first) + 4 + 7 => 3 transforms
    assert len(calls) == 3, calls
