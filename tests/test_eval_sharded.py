"""Sharded (candidate-axis) evaluation on the virtual 8-device mesh must
reproduce the single-device filtered metrics exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu import eval as eval_mod
from knowledgegraphembedding_tpu.config import ModelSpec
from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.parallel import eval_sharded, sharding


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return sharding.build_mesh(8)


CASES = [
    ("RotatE", True, False),
    ("TransE", False, False),
    ("pRotatE", False, False),
    ("ComplEx", True, True),
    ("DistMult", False, False),
]


@pytest.mark.parametrize("model,de,dr", CASES)
def test_sharded_eval_matches_single_device(mesh, model, de, dr):
    ds = make_random_kg(nentity=77, nrelation=4, ntriples=700, n_valid=50, n_test=80, seed=9)
    spec = ModelSpec(
        model_name=model, nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=16, gamma=6.0,
        double_entity_embedding=de, double_relation_embedding=dr,
    )
    params = kge.init_params(spec, jax.random.PRNGKey(3))
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)

    single = eval_mod.test_step(
        params, spec, ds.test[:24], filters,
        test_batch_size=8, eval_chunk_size=16, use_pallas=False,
    )

    pp = sharding.shard_params(sharding.pad_params(params, 8), spec, mesh)
    multi = eval_sharded.sharded_test_step(
        pp, spec, ds.test[:24], filters, mesh, test_batch_size=8,
    )
    for k in single:
        np.testing.assert_allclose(multi[k], single[k], rtol=1e-6, err_msg=k)
