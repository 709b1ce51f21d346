"""End-to-end training-step tests (tiny shapes, CPU mesh).

These are the SURVEY.md §4 "single-chip integration" tier: the full jitted
step (cost volumes + DepthNet + RefineNet + 12-term loss + Adam) must run,
produce finite decreasing losses, and round-trip through orbax checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnmnet_tpu.config import Config
from cnmnet_tpu.train.loop import make_train_step
from cnmnet_tpu.train.state import create_train_state


H, W = 32, 64


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = Config()
    cfg.model.num_planes = 8
    cfg.model.k_size = 5
    cfg.dataset.batch_size = 2
    return cfg


@pytest.fixture(scope="module")
def tiny_batch():
    from cnmnet_tpu.data.pipeline import collate, normalize_images
    from cnmnet_tpu.data.synthetic import SyntheticScenes

    ds = SyntheticScenes(num_samples=2, height=H, width=W, view_num=3)
    batch = collate([ds[0], ds[1]])
    batch["images"] = normalize_images(batch["images"])
    batch.pop("index")
    return {k: jnp.asarray(v) for k, v in batch.items()}


class TestTrainStep:
    def test_loss_decreases_and_finite(self, tiny_cfg, tiny_batch):
        state = create_train_state(tiny_cfg, jax.random.PRNGKey(0), tiny_batch)
        step = make_train_step(tiny_cfg)
        losses = []
        for _ in range(6):
            state, metrics = step(state, tiny_batch)
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
            assert np.isfinite(float(metrics["grad_norm"]))
        assert losses[-1] < losses[0], losses

    def test_wo_normal_recipe_curriculum(self, tiny_cfg, tiny_batch):
        import dataclasses

        cfg = Config()
        cfg.model.num_planes = 8
        cfg.model.k_size = 5
        cfg.train.use_normal_loss = False
        cfg.train.curriculum_epochs = 5
        state = create_train_state(cfg, jax.random.PRNGKey(0), tiny_batch)
        step = make_train_step(cfg)

        # epoch 0: disparity-only
        state0 = state.replace(epoch=jnp.asarray(0, jnp.int32))
        _, m0 = step(state0, tiny_batch)
        # epoch 6: full
        state6 = create_train_state(cfg, jax.random.PRNGKey(0), tiny_batch)
        state6 = state6.replace(epoch=jnp.asarray(6, jnp.int32))
        _, m6 = step(state6, tiny_batch)
        # same params; the gated loss must be strictly larger after curriculum
        assert float(m6["loss"]) > float(m0["loss"])
        # normal terms absent from the wo_normal recipe
        assert "loss_normal_depth" not in m0

    def test_selective_remat_exact(self, tiny_batch):
        """remat is a memory/FLOPs trade, never a numerics one: full remat
        (5 stages) and selective remat (2 high-res stages) must produce the
        same loss and grads as no remat from the same init, and the param
        tree must not re-key (the nn.remat auto-naming hazard)."""
        results = []
        keysets = []
        for remat, stages, refiner in (
            (False, -1, False),
            (True, -1, False),
            (True, 2, False),
            (True, 2, True),
        ):
            cfg = Config()
            cfg.model.num_planes = 8
            cfg.model.k_size = 5
            cfg.model.remat = remat
            cfg.model.remat_stages = stages
            cfg.model.remat_refiner = refiner
            state = create_train_state(cfg, jax.random.PRNGKey(0), tiny_batch)
            keysets.append(jax.tree_util.tree_structure(state.params))
            step = make_train_step(cfg)
            _, m = step(state, tiny_batch)
            results.append((float(m["loss"]), float(m["grad_norm"])))
        assert keysets[0] == keysets[1] == keysets[2]
        base = results[0]
        for r in results[1:]:
            assert r[0] == pytest.approx(base[0], rel=1e-6)
            assert r[1] == pytest.approx(base[1], rel=1e-5)

    def test_remat_stages_validation(self):
        """remat=true with stages outside -1|1..5 would silently disable or
        clamp remat — must raise instead."""
        from cnmnet_tpu.train.state import build_model

        for bad in (0, 6, -2):
            cfg = Config()
            cfg.model.remat = True
            cfg.model.remat_stages = bad
            with pytest.raises(ValueError, match="remat_stages"):
                build_model(cfg)
        cfg = Config()
        cfg.model.remat = False
        cfg.model.remat_stages = 0  # ignored when remat is off
        assert build_model(cfg).remat == 0

    def test_batch_stats_update(self, tiny_cfg, tiny_batch):
        state = create_train_state(tiny_cfg, jax.random.PRNGKey(0), tiny_batch)
        step = make_train_step(tiny_cfg)
        before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
        state, _ = step(state, tiny_batch)
        after = jax.tree_util.tree_leaves(state.batch_stats)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestCheckpoint:
    def test_roundtrip(self, tiny_cfg, tiny_batch, tmp_path):
        from cnmnet_tpu.train.checkpoint import CheckpointManager

        state = create_train_state(tiny_cfg, jax.random.PRNGKey(0), tiny_batch)
        step = make_train_step(tiny_cfg)
        state, _ = step(state, tiny_batch)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        saved_step = mgr.save(state)
        mgr.wait()
        assert mgr.latest_step() == saved_step

        template = create_train_state(tiny_cfg, jax.random.PRNGKey(1), tiny_batch)
        restored = mgr.restore("latest", template)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)

    def test_resume_dir_path_restore(self, tiny_cfg, tiny_batch, tmp_path):
        """The reference-style `resume_dir=<path>` flow: restoring by manager
        root path (what cli train passes through train_loop)."""
        from cnmnet_tpu.train.checkpoint import CheckpointManager

        state = create_train_state(tiny_cfg, jax.random.PRNGKey(0), tiny_batch)
        step = make_train_step(tiny_cfg)
        state, _ = step(state, tiny_batch)
        root = str(tmp_path / "resume_root")
        mgr = CheckpointManager(root)
        mgr.save(state)
        mgr.wait()

        template = create_train_state(tiny_cfg, jax.random.PRNGKey(1), tiny_batch)
        other = CheckpointManager(str(tmp_path / "elsewhere"))
        restored = other.restore(root, template)
        assert int(restored.step) == int(state.step)
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_restore_by_step_dir_path(self, tiny_cfg, tiny_batch, tmp_path):
        """Restoring by a manager *step* directory (`<root>/<step>`), the
        path shape tools pass when pointing at one concrete checkpoint."""
        import os

        from cnmnet_tpu.train.checkpoint import CheckpointManager

        state = create_train_state(tiny_cfg, jax.random.PRNGKey(0), tiny_batch)
        step = make_train_step(tiny_cfg)
        state, _ = step(state, tiny_batch)
        root = str(tmp_path / "stepdir_root")
        mgr = CheckpointManager(root)
        saved_step = mgr.save(state)
        mgr.wait()

        template = create_train_state(tiny_cfg, jax.random.PRNGKey(1), tiny_batch)
        other = CheckpointManager(str(tmp_path / "elsewhere2"))
        restored = other.restore(os.path.join(root, str(saved_step)), template)
        assert int(restored.step) == int(state.step)
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_restore_without_optimizer(self, tiny_cfg, tiny_batch, tmp_path):
        """The reference deliberately skips optimizer restore (`train.py:103`)."""
        from cnmnet_tpu.train.checkpoint import CheckpointManager

        state = create_train_state(tiny_cfg, jax.random.PRNGKey(0), tiny_batch)
        step = make_train_step(tiny_cfg)
        state, _ = step(state, tiny_batch)
        mgr = CheckpointManager(str(tmp_path / "ckpt2"))
        mgr.save(state)
        mgr.wait()
        template = create_train_state(tiny_cfg, jax.random.PRNGKey(1), tiny_batch)
        restored = mgr.restore("latest", template, with_optimizer=False)
        # adam mu must be zeros again
        mu = jax.tree_util.tree_leaves(restored.opt_state)[0]
        assert float(jnp.max(jnp.abs(mu))) == 0.0


class TestActiveDecay:
    def test_transform_masks_zero_grad_leaves(self):
        from cnmnet_tpu.train.state import add_decayed_weights_active

        tx = add_decayed_weights_active(0.1)
        params = {"a": jnp.ones((3,)), "b": jnp.full((3,), 2.0)}
        grads = {"a": jnp.asarray([0.5, 0.0, -0.5]), "b": jnp.zeros((3,))}
        updates, _ = tx.update(grads, tx.init(params), params)
        # active leaf decays (grad + wd * p), frozen leaf passes through
        np.testing.assert_allclose(
            np.asarray(updates["a"]), [0.6, 0.1, -0.4], atol=1e-7
        )
        np.testing.assert_array_equal(np.asarray(updates["b"]), np.zeros(3))

    def test_frozen_refiner_is_bit_identical(self, tiny_cfg, tiny_batch):
        """Staged DepthNet-only pretraining (2-view batches, S==1 skips the
        refiner): the RefineNet params must not be shrunk by weight decay
        (VERDICT round 1 / reference `train.py:89` puts all params in one
        optimizer)."""
        from cnmnet_tpu.data.pipeline import collate, normalize_images
        from cnmnet_tpu.data.synthetic import SyntheticScenes

        ds = SyntheticScenes(num_samples=2, height=H, width=W, view_num=2)
        batch2 = collate([ds[0], ds[1]])
        batch2["images"] = normalize_images(batch2["images"])
        batch2.pop("index")
        batch2 = {k: jnp.asarray(v) for k, v in batch2.items()}

        # init on a 3-view batch so refine_net params exist in the state
        state = create_train_state(tiny_cfg, jax.random.PRNGKey(0), tiny_batch)
        assert "refine_net" in state.params
        before = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(), state.params["refine_net"]
        )
        step = make_train_step(tiny_cfg)
        for _ in range(3):
            state, metrics = step(state, batch2)
            assert np.isfinite(float(metrics["loss"]))
        for a, b in zip(
            jax.tree_util.tree_leaves(before),
            jax.tree_util.tree_leaves(state.params["refine_net"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # while depth_net did train
        d0 = jax.tree_util.tree_leaves(state.params["depth_net"])[0]
        assert not np.allclose(
            np.asarray(d0),
            np.asarray(
                jax.tree_util.tree_leaves(
                    create_train_state(
                        tiny_cfg, jax.random.PRNGKey(0), tiny_batch
                    ).params["depth_net"]
                )[0]
            ),
        )


class TestCheckpointCadence:
    def test_interval_and_epoch_end_saves(self, tiny_batch, monkeypatch, tmp_path):
        """ckpt_interval=2 over one 5-step epoch saves at steps 2, 4 and the
        epoch end (5) — the reference's 8x/epoch analogue
        (`train.py:402-410`), here exact and step-addressed."""
        from cnmnet_tpu.train import loop as loop_mod

        def fake_make_train_step(cfg, mesh=None):
            def fake_step(state, batch):
                return state.replace(step=state.step + 1), {"loss": jnp.asarray(1.0)}

            return fake_step

        monkeypatch.setattr(loop_mod, "make_train_step", fake_make_train_step)

        saved = []

        class Recorder:
            def save(self, state, step=None):
                saved.append(int(step))

            def wait(self):
                pass

        def data():
            for _ in range(5):
                yield tiny_batch

        cfg = Config()
        cfg.model.num_planes = 8
        cfg.train.num_epochs = 1
        cfg.train.ckpt_interval = 2
        loop_mod.train_loop(cfg, data, logger=None, checkpointer=Recorder())
        assert saved == [2, 4, 5]

    def test_max_steps_exit_saves(self, tiny_batch, monkeypatch, tmp_path):
        """A --max-steps run must end checkpointed even when the interval
        doesn't align (VERDICT r3 weak #5): max_steps=3 with interval 2
        saves at 2 (interval) and 3 (exit)."""
        from cnmnet_tpu.train import loop as loop_mod

        def fake_make_train_step(cfg, mesh=None):
            def fake_step(state, batch):
                return state.replace(step=state.step + 1), {"loss": jnp.asarray(1.0)}

            return fake_step

        monkeypatch.setattr(loop_mod, "make_train_step", fake_make_train_step)

        saved = []

        class Recorder:
            def save(self, state, step=None):
                saved.append(int(step))

            def wait(self):
                pass

        def data():
            for _ in range(10):
                yield tiny_batch

        cfg = Config()
        cfg.model.num_planes = 8
        cfg.train.num_epochs = 1
        cfg.train.ckpt_interval = 2
        state = loop_mod.train_loop(
            cfg, data, logger=None, checkpointer=Recorder(), max_steps=3
        )
        assert saved == [2, 3]
        assert int(state.step) == 3

    def test_sigterm_leaves_resumable_checkpoint(self, tmp_path):
        """kill -TERM mid-train must leave a resumable checkpoint (real
        process-level signal delivery, the preemption path the reference
        lacks entirely)."""
        import os
        import signal
        import subprocess
        import sys
        import time

        script = tmp_path / "victim.py"
        ckpt_dir = tmp_path / "ck"
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script.write_text(
            f"""
import sys
sys.path.insert(0, {repo_root!r})
import jax
import jax.numpy as jnp
from cnmnet_tpu.config import Config
from cnmnet_tpu.train import loop as loop_mod
from cnmnet_tpu.train.checkpoint import CheckpointManager
from cnmnet_tpu.train.state import CNMTrainState

def fake_make_train_step(cfg, mesh=None):
    def fake_step(state, batch):
        import time
        time.sleep(0.02)
        print("STEP", int(state.step) + 1, flush=True)
        return state.replace(step=state.step + 1), {{"loss": jnp.asarray(1.0)}}
    return fake_step

loop_mod.make_train_step = fake_make_train_step

def fake_create_train_state(cfg, rng, batch):
    import optax
    from flax import core
    tx = optax.sgd(1e-3)
    params = core.freeze({{"w": jnp.zeros(3)}})
    return CNMTrainState.create(
        apply_fn=lambda *a, **k: None, params=params, tx=tx,
        batch_stats=core.freeze({{}}),
    )

loop_mod.create_train_state = fake_create_train_state

def data():
    while True:
        yield {{"images": jnp.zeros((1,))}}

cfg = Config()
cfg.train.num_epochs = 1
cfg.train.steps_per_epoch = 10_000
cfg.train.ckpt_interval = None
mgr = CheckpointManager({str(ckpt_dir)!r})
print("READY", flush=True)
try:
    loop_mod.train_loop(cfg, data, logger=None, checkpointer=mgr)
except KeyboardInterrupt:
    mgr.wait()
    print("SAVED", flush=True)
    sys.exit(0)
sys.exit(1)
"""
        )
        env = dict(os.environ)
        env.setdefault("JAX_PLATFORMS", "cpu")
        env["JAX_PLATFORM_NAME"] = "cpu"
        proc = subprocess.Popen(
            [sys.executable, str(script)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd="/root/repo",
        )
        try:
            line = proc.stdout.readline()
            assert "READY" in line, line
            # handshake: SIGTERM only after real training progress (a fixed
            # sleep flaked under full-suite load — the signal landed before
            # step 1 and the checkpoint was step 0)
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline:
                line = proc.stdout.readline()
                if line.startswith("STEP") and int(line.split()[1]) >= 3:
                    break
            proc.send_signal(signal.SIGTERM)
            out, _ = proc.communicate(timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert proc.returncode == 0, out
        assert "SAVED" in out, out
        from cnmnet_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(ckpt_dir))
        assert mgr.latest_step() is not None and mgr.latest_step() > 0


class TestWatchdog:
    def test_loggerless_divergence_halts(self, tiny_cfg, tiny_batch, monkeypatch, tmp_path):
        """The NaN watchdog must tick on every step even with no logger
        attached (round-1 weak spot: it only ran inside the logging branch),
        and must leave a resumable checkpoint behind."""
        from cnmnet_tpu.train import loop as loop_mod
        from cnmnet_tpu.train.checkpoint import CheckpointManager

        calls = {"n": 0}

        def fake_make_train_step(cfg, mesh=None):
            def fake_step(state, batch):
                calls["n"] += 1
                loss = jnp.asarray(np.nan if calls["n"] > 2 else 1.0)
                return state.replace(step=state.step + 1), {"loss": loss}

            return fake_step

        monkeypatch.setattr(loop_mod, "make_train_step", fake_make_train_step)

        def data():
            while True:
                yield tiny_batch

        cfg = Config()
        cfg.model.num_planes = 8
        cfg.train.num_epochs = 1
        cfg.train.steps_per_epoch = 50
        mgr = CheckpointManager(str(tmp_path / "wd"))
        with pytest.raises(FloatingPointError, match="non-finite"):
            loop_mod.train_loop(cfg, data, logger=None, checkpointer=mgr)
        # 3-strike: steps 3,4,5 are NaN, detected with one step of lag
        assert calls["n"] <= 8
        assert mgr.latest_step() is not None


class TestGradAccum:
    """train.grad_accum: microbatch-scanned gradient accumulation must be
    EXACTLY the sequential reference (chained BN stats, averaged grads, one
    Adam update) — the knob exists to ride past the native-res activation
    wall (RESULTS.md 480x640 batch 8), so its semantics must be pinned."""

    def test_accum_matches_sequential_reference(self, tiny_batch):
        from cnmnet_tpu.ops.images import prepare_images
        from cnmnet_tpu.train.losses import compute_losses
        from cnmnet_tpu.train.loop import loss_weights_from_config

        cfg = Config()
        cfg.model.num_planes = 8
        cfg.model.k_size = 5
        cfg.dataset.batch_size = 2
        cfg.train.grad_accum = 2

        state = create_train_state(cfg, jax.random.PRNGKey(0), tiny_batch)
        new_state, metrics = make_train_step(cfg)(state, tiny_batch)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["grad_norm"]))

        # hand-rolled reference: python loop over microbatches. The
        # per-microbatch value_and_grad is JITTED: an eager reference
        # deviates rel ~2.5e-3 in grad_norm purely from jit-vs-eager fp
        # reassociation in the conv/BN backward (measured round 5: jitted
        # scan == jitted sequential BIT-EXACTLY, rel 0.0, while either
        # jitted path vs the eager loop differs 2.5e-3 — so the test must
        # compare like-compiled paths to bind on accumulation SEMANTICS,
        # i.e. chained BN stats + averaged grads + one update).
        w = loss_weights_from_config(cfg)
        ref = create_train_state(cfg, jax.random.PRNGKey(0), tiny_batch)
        stats = ref.batch_stats
        grads_total = None
        losses = []

        def loss_fn(params, stats, mb):
            out, mutated = ref.apply_fn(
                {"params": params, "batch_stats": stats},
                prepare_images(mb["images"]),
                mb["cams"],
                train=True,
                mutable=["batch_stats"],
            )
            loss, _ = compute_losses(out, mb, ref.epoch, w)
            return loss, mutated["batch_stats"]

        vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        for i in range(2):
            mb = {k: v[i : i + 1] for k, v in tiny_batch.items()}
            (loss, stats), g = vg(ref.params, stats, mb)
            losses.append(float(loss))
            grads_total = (
                g
                if grads_total is None
                else jax.tree_util.tree_map(jnp.add, grads_total, g)
            )
        grads = jax.tree_util.tree_map(lambda x: x / 2.0, grads_total)
        ref2 = ref.apply_gradients(grads=grads, batch_stats=stats)

        assert float(metrics["loss"]) == pytest.approx(
            np.mean(losses), rel=1e-5
        )
        ref_gnorm = float(
            jnp.sqrt(
                sum(
                    jnp.sum(jnp.square(g))
                    for g in jax.tree_util.tree_leaves(grads)
                )
            )
        )
        assert float(metrics["grad_norm"]) == pytest.approx(ref_gnorm, rel=1e-4)
        # Param comparison masks elements whose gradient is ~0: Adam's
        # first-step update there is +-lr * sign(g), so fp summation-order
        # epsilons legitimately flip it — not an accumulation defect.
        for a, b, g in zip(
            jax.tree_util.tree_leaves(new_state.params),
            jax.tree_util.tree_leaves(ref2.params),
            jax.tree_util.tree_leaves(grads),
        ):
            g = np.asarray(g)
            stable = np.abs(g) > 1e-6 * (np.abs(g).max() + 1e-30)
            np.testing.assert_allclose(
                np.asarray(a)[stable], np.asarray(b)[stable], rtol=2e-5, atol=1e-5
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(new_state.batch_stats),
            jax.tree_util.tree_leaves(ref2.batch_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5
            )

    def test_accum_requires_divisible_batch(self, tiny_batch):
        cfg = Config()
        cfg.model.num_planes = 8
        cfg.model.k_size = 5
        cfg.train.grad_accum = 3
        state = create_train_state(cfg, jax.random.PRNGKey(0), tiny_batch)
        with pytest.raises(ValueError, match="grad_accum"):
            make_train_step(cfg)(state, tiny_batch)
