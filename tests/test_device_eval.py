"""Device-resident eval filter (eval.DeviceFilter + the device-input path of
eval.test_step): the on-device mask and the full metric pipeline must equal
the host-mask path exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu import eval as eval_mod
from knowledgegraphembedding_tpu.config import ModelSpec
from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
from knowledgegraphembedding_tpu.models import kge, scorers


def _setup(model="RotatE", E=73, R=5, seed=0):
    ds = make_random_kg(nentity=E, nrelation=R, ntriples=400, n_valid=40,
                        n_test=40, seed=seed)
    spec = ModelSpec(
        model_name=model, nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=16, gamma=6.0,
        double_entity_embedding=model in ("RotatE", "ComplEx"),
        double_relation_embedding=model == "ComplEx",
    )
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity,
                               ds.nrelation)
    params = kge.init_params(spec, jax.random.PRNGKey(1))
    return ds, spec, filters, params


@pytest.mark.parametrize("mode", [scorers.HEAD_BATCH, scorers.TAIL_BATCH])
def test_device_mask_equals_host_mask(mode):
    ds, spec, filters, params = _setup()
    dev = eval_mod.DeviceFilter(filters)
    pos = np.asarray(ds.test[:16], np.int32)
    host = filters.filter_mask_rows(pos, mode)
    got = np.asarray(dev.mask_rows(jnp.asarray(pos), mode, width=spec.nentity + 3))
    assert (got[:, : spec.nentity] == host).all()
    # nothing real beyond the entity columns except the scatter sink
    assert not got[:, spec.nentity:-1].any()


@pytest.mark.parametrize("model", ["RotatE", "TransE", "DistMult", "ComplEx",
                                   "pRotatE"])
def test_device_eval_metrics_equal_host(model):
    ds, spec, filters, params = _setup(model=model)
    kw = dict(test_batch_size=8, eval_chunk_size=32, use_pallas=False)
    m_host = eval_mod.test_step(params, spec, ds.test, filters,
                                device_filter=False, **kw)
    m_dev = eval_mod.test_step(params, spec, ds.test, filters,
                               device_filter=True, **kw)
    for k in m_host:
        assert m_host[k] == pytest.approx(m_dev[k], abs=1e-9), (model, k)


def test_device_eval_with_pallas_interpret_matches():
    """Device filter composed with the Pallas rank kernel (interpret mode on
    CPU) still equals the host path."""
    from knowledgegraphembedding_tpu.ops import pallas_rank

    ds, spec, filters, params = _setup(model="TransE", E=61)
    kw = dict(test_batch_size=8, eval_chunk_size=32)
    m_host = eval_mod.test_step(params, spec, ds.test, filters,
                                device_filter=False, use_pallas=False, **kw)

    # monkeypatch-free: drive the ranker directly through the device mask
    dev = eval_mod.DeviceFilter(filters)
    ranker = pallas_rank.PallasRanker(params, spec, TE=32, interpret=True)
    logs = []
    trip = np.asarray(ds.test, np.int32)
    n_pad = -(-len(trip) // 8) * 8
    trip_p = np.concatenate([trip, np.repeat(trip[-1:], n_pad - len(trip), 0)])
    pos_all = jnp.asarray(trip_p)
    for mode in (scorers.HEAD_BATCH, scorers.TAIL_BATCH):
        for i in range(0, len(trip), 8):
            pos_p = jax.lax.dynamic_slice_in_dim(pos_all, i, 8, axis=0)
            mask = dev.mask_rows(pos_p, mode, width=-(-spec.nentity // 32) * 32)
            ranks = ranker.ranks(pos_p, mask, mode)
            logs.extend(eval_mod.metrics_from_ranks(
                np.asarray(ranks)[: min(8, len(trip) - i)]
            ))
    m_dev = {k: float(np.mean([lg[k] for lg in logs])) for k in logs[0]}
    for k in m_host:
        assert m_host[k] == pytest.approx(m_dev[k], abs=1e-9), k


def test_ragged_tail_batch_padding():
    """n_test not divisible by batch: padded rows' ranks must be dropped."""
    ds, spec, filters, params = _setup(model="DistMult")
    kw = dict(eval_chunk_size=32, use_pallas=False)
    m_host = eval_mod.test_step(params, spec, ds.test[:13], filters,
                                device_filter=False, test_batch_size=5, **kw)
    m_dev = eval_mod.test_step(params, spec, ds.test[:13], filters,
                               device_filter=True, test_batch_size=5, **kw)
    for k in m_host:
        assert m_host[k] == pytest.approx(m_dev[k], abs=1e-9), k


def test_bounded_plumbing_past_group_size():
    """_unstack_bounded/_concat_bounded at > _GROUP elements (the compiled
    program operand bound) must round-trip exactly."""
    n = eval_mod._GROUP * 2 + 37  # forces two-level unstack + chunked concat
    stacked = jnp.arange(n * 3).reshape(n, 3)
    parts = eval_mod._unstack_bounded(stacked)
    assert len(parts) == n
    back = np.asarray(eval_mod._concat_bounded([p[None] if p.ndim == 1 else p for p in parts]))
    np.testing.assert_array_equal(back.reshape(n, 3), np.asarray(stacked))


@pytest.mark.parametrize("E,chunk,n_test,tb", [
    (64, 16, 7, 4),    # E divisible by chunk (chunk_pad == E, width = E+1)
    (64, 64, 64, 16),  # one chunk exactly; n_test == eff_batch multiple
    (33, 16, 5, 4),    # ragged everything: E, batches, scan-chunk padding
    (48, 16, 97, 4),   # n_test >> eff_batch with a ragged tail batch
])
def test_device_eval_edge_shapes_match_host(E, chunk, n_test, tb):
    """Padding edge cases of the scanned device-eval path (chunk_pad == E,
    ragged batch counts, scan-chunk padding) must reproduce the host-mask
    path's metrics exactly."""
    import numpy as np

    from knowledgegraphembedding_tpu import eval as eval_mod
    from knowledgegraphembedding_tpu.config import ModelSpec
    from knowledgegraphembedding_tpu.data.filterset import FilterSets
    from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
    from knowledgegraphembedding_tpu.models import kge
    import jax

    ds = make_random_kg(nentity=E, nrelation=3, ntriples=E * 8,
                        n_valid=8, n_test=n_test, seed=E + n_test)
    spec = ModelSpec(model_name="RotatE", nentity=E, nrelation=3,
                     hidden_dim=8, gamma=6.0, double_entity_embedding=True)
    params = kge.init_params(spec, jax.random.PRNGKey(0))
    filters = FilterSets.build(ds.train, ds.all_true_triples, E, 3)
    host = eval_mod.test_step(params, spec, ds.test, filters,
                              test_batch_size=tb, eval_chunk_size=chunk,
                              use_pallas=False, device_filter=False)
    dev = eval_mod.test_step(params, spec, ds.test, filters,
                             test_batch_size=tb, eval_chunk_size=chunk,
                             use_pallas=False, device_filter=True)
    for k in host:
        assert host[k] == dev[k], (k, host[k], dev[k])


def test_zero_test_log_steps_does_not_crash():
    """--test_log_steps 0 must not zero the scan chunk (range step 0) or the
    progress-log modulus on either eval path (r3 advisor)."""
    import logging as _logging

    ds, spec, filters, params = _setup()
    kw = dict(test_batch_size=8, eval_chunk_size=32, use_pallas=False,
              test_log_steps=0, logger=_logging.getLogger("t"))
    m_host = eval_mod.test_step(params, spec, ds.test, filters,
                                device_filter=False, **kw)
    m_dev = eval_mod.test_step(params, spec, ds.test, filters,
                               device_filter=True, **kw)
    for k in m_host:
        assert m_host[k] == pytest.approx(m_dev[k], abs=1e-9), k
