"""fast_rng_key: threefry → unsafe_rbg key derivation (utils.fast_rng)."""

import jax
import jax.numpy as jnp
import numpy as np

from sgdm_tpu.utils.fast_rng import fast_rng_key
import pytest


def test_typed_and_raw_keys_accepted():
    typed = jax.random.PRNGKey(7)          # raw uint32[2] (legacy default)
    new = jax.random.key(7)                # typed threefry
    k1 = fast_rng_key(typed)
    k2 = fast_rng_key(new)
    assert jax.random.key_data(k1).shape[-1] == 4
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k1)),
        np.asarray(jax.random.key_data(k2)),
    )


def test_deterministic_and_distinct():
    a1 = jax.random.normal(fast_rng_key(jax.random.PRNGKey(0)), (16,))
    a2 = jax.random.normal(fast_rng_key(jax.random.PRNGKey(0)), (16,))
    b = jax.random.normal(fast_rng_key(jax.random.PRNGKey(1)), (16,))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(np.asarray(a1), np.asarray(b))


def test_idempotent_on_rbg_family_keys():
    k = fast_rng_key(jax.random.PRNGKey(3))
    k2 = fast_rng_key(k)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k)),
        np.asarray(jax.random.key_data(k2)),
    )


def test_split_and_fold_work_without_threefry_loops():
    k = fast_rng_key(jax.random.PRNGKey(5))
    k1, k2 = jax.random.split(k)
    f = jax.random.fold_in(k, 42)
    outs = [np.asarray(jax.random.normal(x, (4,))) for x in (k1, k2, f)]
    for i in range(len(outs)):
        for j in range(i + 1, len(outs)):
            assert not np.allclose(outs[i], outs[j])


@pytest.mark.slow  # >10s-class (measured r5 full-suite profile) -> slow tier
def test_train_step_lowering_has_no_while_loops():
    """The fused train step must contain zero rolled-threefry while loops
    (they cost ~28 ms/step on the TPU scalar unit, BASELINE.md round 2)."""
    import re

    import bench

    _, _, state, step, batch = bench.build(4, 16, 8, 32, use_pallas=False)
    txt = step.lower(state, batch, jax.random.PRNGKey(1)).as_text()
    assert len(re.findall(r"stablehlo\.while", txt)) == 0
