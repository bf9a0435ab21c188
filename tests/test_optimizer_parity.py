"""Trajectory parity: our optax adan_sf vs the reference torch adan_sf.

adan_sf is the DEFAULT optimizer in every reference train template, and it
guards every checkpoint and validation (the schedule-free x-iterate).  We
run both implementations on an identical tiny quadratic problem with
identical gradients for 200 steps (warmup active for the first 20) and
require the y-iterate trajectory AND the recovered eval (x) iterate to
agree."""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _load_ref_adan_sf():
    spec = importlib.util.spec_from_file_location(
        "ref_adan_sf", "/root/reference/neosr/optimizers/adan_sf.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_adan_sf"] = mod
    spec.loader.exec_module(mod)
    return mod.adan_sf


@pytest.mark.parametrize("warmup,wd,mgn", [(20, 0.02, 0.0), (0, 0.0, 1.0)])
def test_adan_sf_trajectory_parity(warmup, wd, mgn):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(8, 8)).astype(np.float32)
    targets = rng.normal(size=(200, 8, 8)).astype(np.float32) * 2.0

    lr, betas = 2e-3, (0.98, 0.92, 0.99)

    # ---- torch side
    ref_cls = _load_ref_adan_sf()
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = ref_cls([p], lr=lr, betas=betas, weight_decay=wd,
                  warmup_steps=warmup, max_grad_norm=mgn)
    opt.train()
    torch_traj = []
    for t in range(200):
        opt.zero_grad()
        loss = ((p - torch.from_numpy(targets[t])) ** 2).sum()
        loss.backward()
        opt.step()
        if (t + 1) % 50 == 0:
            torch_traj.append(p.detach().numpy().copy())
    opt.eval()
    torch_eval = p.detach().numpy().copy()

    # ---- jax side
    from neosr_tpu.optimizers.schedule_free import adan_sf, sf_eval_params

    tx = adan_sf(lr=lr, betas=betas, weight_decay=wd, warmup_steps=warmup,
                 max_grad_norm=mgn)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)

    @jax.jit
    def step(params, state, target):
        grads = jax.grad(lambda pp: ((pp["w"] - target) ** 2).sum())(params)
        updates, state = tx.update(grads, state, params)
        return jax.tree.map(lambda a, b: a + b, params, updates), state

    jax_traj = []
    for t in range(200):
        params, state = step(params, state, jnp.asarray(targets[t]))
        if (t + 1) % 50 == 0:
            jax_traj.append(np.asarray(params["w"]))
    jax_eval = np.asarray(sf_eval_params(state, params)["w"])

    for i, (tw, jw) in enumerate(zip(torch_traj, jax_traj)):
        np.testing.assert_allclose(jw, tw, rtol=2e-4, atol=2e-5,
                                   err_msg=f"y-iterate diverged @50*{i + 1}")
    np.testing.assert_allclose(jax_eval, torch_eval, rtol=2e-4, atol=2e-5,
                               err_msg="eval (x) iterate diverged")


@pytest.mark.parametrize("otype", [
    "adam", "adamw", "nadam", "adan", "adan_sf", "adamw_sf", "adamw_win",
])
def test_every_optimizer_steps_fused(otype):
    """Every registered optimizer builds, steps, and stays finite under the
    default fused (flattened) wrapping, and SF eval-params unravels."""
    import jax
    import jax.numpy as jnp

    from neosr_tpu.optimizers import build_optimizer
    from neosr_tpu.optimizers.schedule_free import sf_eval_params

    params = {
        "a": {"kernel": jnp.ones((4, 5)), "bias": jnp.zeros((5,))},
        "b": {"kernel": jnp.full((5, 2), 0.5)},
    }
    optim, _lr = build_optimizer({"type": otype, "lr": 1e-3}, None, 100, -1)
    state = optim.init(params)
    for i in range(3):
        grads = jax.tree.map(lambda p: 0.01 * (i + 1) * jnp.ones_like(p), params)
        updates, state = optim.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    ev = sf_eval_params(state, params)
    assert jax.tree_util.tree_structure(ev) == jax.tree_util.tree_structure(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(ev))


@pytest.mark.parametrize("ckpt_fused", [True, False])
def test_resume_across_fused_layout_change(ckpt_fused):
    """A checkpoint written with one `fused` setting must restore into a
    runtime built with the other: adapt_opt_layout converts the moment
    buffers (ravel/concat vs per-leaf) and the continued trajectory must
    match an uninterrupted run bit-for-bit (ADVICE r2 low #2)."""
    from flax import serialization

    from neosr_tpu.optimizers import adapt_opt_layout, build_optimizer

    params = {
        "a": {"kernel": jnp.arange(12.0).reshape(3, 4) / 7.0,
              "bias": jnp.ones((4,))},
        "b": {"w": jnp.linspace(-1, 1, 10).reshape(2, 5)},
    }
    grads_seq = [
        jax.tree.map(lambda p, i=i: jnp.cos(p * (i + 1)) * 0.1, params)
        for i in range(6)
    ]
    cfg = {"type": "adamw", "lr": 1e-2, "betas": [0.9, 0.999],
           "weight_decay": 0.01}

    def run(fused, start, n, p, s=None):
        optim, _ = build_optimizer({**cfg, "fused": fused})
        if s is None:
            s = optim.init(p)
        for i in range(n):
            upd, s = optim.update(grads_seq[start + i], s, p)
            p = optax_apply(p, upd)
        return p, s, optim

    import optax

    def optax_apply(p, upd):
        return optax.apply_updates(p, upd)

    # uninterrupted reference runs in BOTH layouts (trajectories identical)
    p_ref, _, _ = run(not ckpt_fused, 0, 6, params)

    # run 3 steps in the checkpoint layout, serialize, restore into the
    # OTHER layout via the adapter, run the remaining 3
    p_mid, s_mid, _ = run(ckpt_fused, 0, 3, params)
    raw = serialization.msgpack_restore(serialization.to_bytes(s_mid))

    optim2, _ = build_optimizer({**cfg, "fused": not ckpt_fused})
    s_target = optim2.init(p_mid)
    adapted = adapt_opt_layout(raw, s_target, p_mid)
    s_restored = serialization.from_state_dict(s_target, adapted)

    p_cont, _, _ = run(not ckpt_fused, 3, 3, p_mid, s_restored)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(p_cont)[0]),
        np.asarray(jax.tree.leaves(p_ref)[0]), rtol=1e-6, atol=1e-7,
    )
    for a, b in zip(jax.tree.leaves(p_cont), jax.tree.leaves(p_ref), strict=True):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
