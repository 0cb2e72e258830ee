"""Trainability of the learned-model family on synthetic labeled data.

VERDICT r1 weak #8: the architectures (models.aliked_tpu,
models.lightglue_tpu) shipped with shape/grad tests only. These tests
train each a few dozen steps on synthetically generated supervision (the
"infinite labeled pairs" the synthetic generator provides) and assert the
loss actually drops and the task is learned — detector localizes blobs,
matcher recovers a ground-truth permutation."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest


def _blob_image(rng, h=32, w=32, n_blobs=3):
    img = np.zeros((h, w), np.float32)
    tgt = np.zeros((h, w), np.float32)
    ys = rng.integers(4, h - 4, n_blobs)
    xs = rng.integers(4, w - 4, n_blobs)
    yy, xx = np.mgrid[0:h, 0:w]
    for y, x in zip(ys, xs):
        d2 = (yy - y) ** 2 + (xx - x) ** 2
        img += np.exp(-d2 / 4.0)
        tgt = np.maximum(tgt, np.exp(-d2 / 2.0))
    img += rng.normal(0, 0.03, img.shape)
    return img.astype(np.float32), tgt


class TestALIKEDTrains:
    def test_detector_learns_blobs(self):
        from splat_one_tpu.models.aliked_tpu import (
            aliked_forward, init_aliked)

        rng = np.random.default_rng(0)
        imgs, tgts = zip(*(_blob_image(rng) for _ in range(8)))
        imgs = jnp.asarray(np.stack(imgs))[..., None]
        tgts = jnp.asarray(np.stack(tgts))

        params = init_aliked(jax.random.PRNGKey(0), desc_dim=32)
        opt = optax.adam(3e-4)
        state = opt.init(params)

        def loss_fn(p):
            score, _ = aliked_forward(p, imgs)
            # blobs cover a tiny area: weight them up or the constant-zero
            # map is a strong local minimum (all-dead-ReLU collapse)
            w = 1.0 + 30.0 * tgts
            return jnp.mean(w * (score - tgts) ** 2) / jnp.mean(w)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l

        l0 = float(loss_fn(params))
        for _ in range(150):
            params, state, l = step(params, state)
        assert float(l) < l0 / 3

        # trained detector localizes: peak of the score map sits on a blob
        score, _ = aliked_forward(params, imgs[:1])
        peak = jnp.unravel_index(jnp.argmax(score[0]), score[0].shape)
        assert float(tgts[0][peak]) > 0.3


class TestLightGlueTrains:
    def test_matcher_learns_permutation(self):
        from splat_one_tpu.models.lightglue_tpu import (
            init_lightglue, lightglue_scores)

        K, D = 12, 32
        rng = np.random.default_rng(1)
        params = init_lightglue(jax.random.PRNGKey(2), desc_dim=D)
        opt = optax.adam(2e-3)
        state = opt.init(params)
        valid = jnp.ones((K,), bool)

        def sample(seed):
            r = np.random.default_rng(seed)
            da = r.normal(size=(K, D)).astype(np.float32)
            da /= np.linalg.norm(da, axis=1, keepdims=True)
            perm = r.permutation(K)
            db = da[perm] + r.normal(0, 0.1, (K, D)).astype(np.float32)
            db /= np.linalg.norm(db, axis=1, keepdims=True)
            xa = r.uniform(0, 1, (K, 2)).astype(np.float32)
            # db[j] = da[perm[j]]: row i of A matches column inv_perm[i]
            label = np.argsort(perm)
            return (jnp.asarray(da), jnp.asarray(db), jnp.asarray(xa),
                    jnp.asarray(xa[perm]), jnp.asarray(label))

        def loss_fn(p, da, db, xa, xb, perm):
            sim, ma, mb = lightglue_scores(p, da, db, xa, xb, valid, valid)
            ce = -jnp.mean(jax.nn.log_softmax(sim, axis=1)[
                jnp.arange(K), perm])
            match = -jnp.mean(jnp.log(ma + 1e-6) + jnp.log(mb + 1e-6))
            return ce + 0.1 * match

        @jax.jit
        def step(p, s, batch):
            l, g = jax.value_and_grad(loss_fn)(p, *batch)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l

        batches = [sample(i) for i in range(24)]
        l0 = float(loss_fn(params, *batches[0]))
        for it in range(300):
            params, state, l = step(params, state, batches[it % 24])
        assert float(l) < l0

        # learned matcher recovers the permutation on a HELD-OUT pair
        da, db, xa, xb, perm = sample(999)
        sim, _, _ = lightglue_scores(params, da, db, xa, xb, valid, valid)
        acc = float(jnp.mean((jnp.argmax(sim, axis=1) == perm)))
        assert acc > 0.8, f"held-out matching accuracy {acc}"
