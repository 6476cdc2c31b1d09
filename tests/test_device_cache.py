"""Device-resident bag cache (data/device_cache.py): batches served from
HBM after their first transfer must be bit-identical to freshly-assembled
ones, the second pass over a dataset must perform zero host assemblies,
and the budget / augmentation / exact-mode bypasses must hold.

Runs on the CPU backend with device_cache='on' (the 'auto' mode enables
itself only on real TPU backends, where host->device bandwidth is the
bottleneck the cache exists to remove)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rrtmil_tpu.config import RRTEncoderConfig, RRTMILConfig
from rrtmil_tpu.data.device_cache import DeviceBagCache
from rrtmil_tpu.models import RRTMIL
from rrtmil_tpu.train.engine import Engine, EngineConfig


def _dataset(n_bags=10, dim=32, seed=0):
    class DS:
        def __init__(self):
            rng = np.random.default_rng(seed)
            self.bags = []
            self.labels = []
            for i in range(n_bags):
                n = int(rng.integers(40, 300))
                self.bags.append(rng.normal(size=(n, dim)).astype(np.float32))
                self.labels.append(i % 2)

        def __len__(self):
            return len(self.bags)

        def __getitem__(self, i):
            return self.bags[i], self.labels[i]

    return DS()


def _engine(batch_size=1, cache="on", **kw):
    cfg = RRTMILConfig(input_dim=32,
                       encoder=RRTEncoderConfig(epeg_k=9, crmsa_k=1))
    model = RRTMIL(cfg)
    eng = Engine(model, EngineConfig(batch_size=batch_size,
                                     device_cache=cache, **kw),
                 encoder_cfg=cfg.encoder)
    return eng, cfg


@pytest.mark.parametrize("batch_size", [1, 4])
def test_cached_eval_matches_uncached(batch_size):
    ds = _dataset()
    eng_c, cfg = _engine(batch_size, cache="on")
    eng_u, _ = _engine(batch_size, cache="off")
    state = eng_c.init(jax.random.PRNGKey(0), 200, 32)
    pc1, lc1, lossc1 = eng_c.evaluate(state.params, ds)  # cold: fills cache
    pc2, lc2, lossc2 = eng_c.evaluate(state.params, ds)  # warm: from cache
    pu, lu, lossu = eng_u.evaluate(state.params, ds)
    np.testing.assert_array_equal(pc1, pu)
    np.testing.assert_array_equal(pc2, pu)
    np.testing.assert_array_equal(lc1, lu)
    assert lossc1 == lossu and lossc2 == lossu
    assert len(eng_c._dcache) == len(ds)
    assert eng_u._dcache is None


def test_warm_pass_does_no_host_assembly(monkeypatch):
    ds = _dataset()
    eng, _ = _engine(batch_size=4, cache="on")
    state = eng.init(jax.random.PRNGKey(0), 200, 32)
    eng.evaluate(state.params, ds)
    calls = {"n": 0}
    orig = eng._assemble_host

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    eng._assemble_host = counting
    eng.evaluate(state.params, ds)
    assert calls["n"] == 0, "warm epoch re-assembled host batches"


def test_budget_exhaustion_degrades_to_streaming():
    ds = _dataset()
    eng, _ = _engine(batch_size=1, cache="on")
    eng.cfg.device_cache_bytes = 1  # nothing fits
    eng_u, _ = _engine(batch_size=1, cache="off")
    state = eng.init(jax.random.PRNGKey(0), 200, 32)
    p1, _, _ = eng.evaluate(state.params, ds)
    p2, _, _ = eng.evaluate(state.params, ds)
    pu, _, _ = eng_u.evaluate(state.params, ds)
    np.testing.assert_array_equal(p1, pu)
    np.testing.assert_array_equal(p2, pu)
    assert len(eng._dcache) == 0


def test_train_epoch_cache_on_equals_off():
    ds = _dataset()

    def run(cache):
        eng, _ = _engine(batch_size=2, cache=cache, lr=1e-3, seed=3)
        state = eng.init(jax.random.PRNGKey(0), 200, 32)
        losses = []
        for epoch in range(3):
            state, loss = eng.train_epoch(state, ds, epoch,
                                          jax.random.PRNGKey(5))
            losses.append(loss)
        return losses

    np.testing.assert_array_equal(run("on"), run("off"))


def test_augmented_training_bypasses_cache():
    ds = _dataset()
    eng, _ = _engine(batch_size=1, cache="on", patch_shuffle=True)
    state = eng.init(jax.random.PRNGKey(0), 200, 32)
    state, _ = eng.train_epoch(state, ds, 0, jax.random.PRNGKey(1))
    assert eng._dcache is None or len(eng._dcache) == 0
    # eval of the same engine is deterministic -> cache allowed there
    eng.evaluate(state.params, ds)
    assert len(eng._dcache) == len(ds)


def test_cache_key_isolation_and_drop():
    cache = DeviceBagCache(budget_bytes=1 << 20)
    ds_a, ds_b = _dataset(2), _dataset(2)
    x = jnp.zeros((1, 8, 4))
    m = jnp.ones((1, 8), bool)
    y = jnp.zeros((1,), jnp.int32)
    assert cache.put(ds_a, 0, x, m, y, spec="s")
    assert cache.get(ds_b, 0) is None
    assert cache.get(ds_a, 0) is not None
    used = cache.used
    assert used > 0
    cache.put(ds_a, 0, x, m, y, spec="s")   # idempotent
    assert cache.used == used
    cache.drop_dataset(ds_a)
    assert cache.get(ds_a, 0) is None and cache.used == 0


def test_mem_paths_never_collide_across_datasets():
    """ArrayDataset fabricates 'mem://{i}' slide paths; two distinct
    in-memory datasets sharing one cache must NOT serve each other's bags
    (ADVICE r4 medium: path-keyed entries trusted any string as an on-disk
    identity)."""
    from rrtmil_tpu.data.datasets import ArrayDataset
    cache = DeviceBagCache(budget_bytes=1 << 20)
    ds_a = ArrayDataset([np.zeros((8, 4), np.float32)], [0])
    ds_b = ArrayDataset([np.ones((8, 4), np.float32)], [1])
    assert ds_a.slide_path[0] == ds_b.slide_path[0] == "mem://0"
    xa = jnp.zeros((1, 8, 4))
    cache.put(ds_a, 0, xa, jnp.ones((1, 8), bool), jnp.zeros((1,), jnp.int32),
              spec="s")
    assert cache.get(ds_b, 0) is None          # no cross-dataset hit
    assert cache.get(ds_a, 0) is not None
    cache.drop_dataset(ds_a)
    assert cache.get(ds_a, 0) is None and cache.used == 0


def test_survival_resolved_path_keys():
    """Two survival views with different folder/root must key the same CSV
    row differently; identical resolution shares the entry (ADVICE r4)."""
    from rrtmil_tpu.data.survival import ArraySurvivalDataset
    cache = DeviceBagCache(budget_bytes=1 << 20)

    class FakeSurv:
        keep_same_psize = 0

        def __init__(self, folder, root):
            self.folder, self.root = folder, root
            self.wsi_paths = ["a/resnet50/x.npy"]

        def __len__(self):
            return 1

        def resolved_path(self, i):
            import os
            p = self.wsi_paths[i].replace("resnet50", self.folder)
            return os.path.join(self.root, p)

    ds1, ds2 = FakeSurv("plip", "/r1"), FakeSurv("resnet50", "/r2")
    ds3 = FakeSurv("plip", "/r1")
    x = jnp.zeros((1, 8, 4))
    m, y = jnp.ones((1, 8), bool), jnp.zeros((1,), jnp.int32)
    cache.put(ds1, 0, x, m, y, spec="s")
    assert cache.get(ds2, 0) is None           # different resolution
    assert cache.get(ds3, 0) is not None       # same resolution shares
    # in-memory survival bags fall back to id-keyed entries
    bags = [np.zeros((8, 4), np.float32)]
    mem1 = ArraySurvivalDataset(bags, [50.0], [1])
    mem2 = ArraySurvivalDataset(bags, [50.0], [1])
    cache.put(mem1, 0, x, m, y, spec="s")
    assert cache.get(mem2, 0) is None


def test_survival_engine_cache_parity():
    """Survival engine: cached train/validate trajectories must equal the
    uncached ones exactly (same bags, same RNG stream)."""
    from rrtmil_tpu.data.survival import ArraySurvivalDataset
    from rrtmil_tpu.harness.survival import build_survival_model
    from rrtmil_tpu.train.surv_engine import (SurvivalEngine,
                                              SurvivalEngineConfig)
    rng = np.random.default_rng(0)
    bags = [rng.normal(size=(int(rng.integers(40, 150)), 32)
                       ).astype(np.float32) for _ in range(8)]
    ds = ArraySurvivalDataset(bags, [float(i * 100 + 50) for i in range(8)],
                              [i % 2 for i in range(8)])
    model, enc = build_survival_model("RRTMIL", n_features=32, epeg_k=9,
                                      crmsa_k=1)

    def run(cache):
        cfg = SurvivalEngineConfig(num_epochs=2, device_cache=cache)
        eng = SurvivalEngine(model, cfg, enc)
        state = eng.init(jax.random.PRNGKey(0), 150, 32)
        outs = []
        for epoch in range(2):
            state, loss, ci = eng.train_epoch(state, ds, list(range(6)),
                                              epoch, jax.random.PRNGKey(4))
            vloss, vci = eng.validate(state.params, ds, [6, 7])
            outs.append((loss, ci, vloss, vci))
        return outs, eng

    got_on, eng_on = run("on")
    got_off, eng_off = run("off")
    np.testing.assert_array_equal(np.asarray(got_on), np.asarray(got_off))
    assert len(eng_on._dcache) == 8
    assert eng_off._dcache is None
