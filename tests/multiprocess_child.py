"""Child worker for the real multi-process CPU test (run via subprocess).

Each of the two processes: initializes `jax.distributed` against a
localhost coordinator, loads ONLY its `_process_shard` slice of a
deterministic global batch, assembles the global sharded array, runs one
REAL sharded train step over the global mesh, and writes a per-process
FID-style sample dir — then dumps a JSON result for the parent test to
assert on.  Parity: per-rank DataLoaders + rank-suffixed sample dirs
(SURVEY.md §5.8; ref: pl_datamodule/dm.py:34, eval/test_exps/
common_stuff.py:127-128).
"""

import json
import os
import sys


def _process_slice(n, pid, nproc):
    per = n // nproc
    return slice(pid * per, (pid + 1) * per)


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.process_index() == pid

    import numpy as np

    from sgdm_tpu.data.datamodule import _process_shard
    from sgdm_tpu.eval.harness import _process_suffix
    from sgdm_tpu.parallel.mesh import (
        create_mesh,
        local_batch_slice,
        replicated_sharding,
        shard_batch,
    )

    global_bs = 8
    sl = _process_shard(global_bs)
    assert sl == local_batch_slice(global_bs), (sl, pid)

    # ---- input disjointness/coverage: each process loads only its slice of
    # a deterministic global "dataset" (row i filled with value i)
    global_ids = np.arange(global_bs, dtype=np.float32)
    local = global_ids[sl]
    mesh = create_mesh()  # all global (virtual CPU) devices on 'data'
    with mesh:
        arr = shard_batch({"x": local}, mesh)["x"]
        gathered = np.asarray(
            jax.jit(lambda a: a,
                    out_shardings=replicated_sharding(mesh))(arr)
        )
    assert gathered.shape == (global_bs,)
    np.testing.assert_array_equal(gathered, global_ids)

    # ---- one REAL sharded train step on the global mesh
    import jax.numpy as jnp

    from sgdm_tpu.diffusion import GaussianDiffusion
    from sgdm_tpu.models import UNetModel
    from sgdm_tpu.training.optim import create_optimizer
    from sgdm_tpu.training.state import create_train_state, make_train_step

    model = UNetModel(
        model_channels=32, out_channels=3, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_heads=4,
        resblock_updown=True, cond_dim=16,
    )
    diffusion = GaussianDiffusion(num_timesteps=100)
    tx = create_optimizer("adamw", lr=1e-4, scheduler=None)
    local_bs = global_bs // nproc
    local_batch = {
        "image": np.full((local_bs, 16, 16, 3), pid, np.float32),
        "cond": np.zeros((local_bs, 16), np.float32),
    }
    # template init on the full global shape (replicated params)
    tmpl = {
        "image": jnp.zeros((global_bs, 16, 16, 3), jnp.float32),
        "cond": jnp.zeros((global_bs, 16), jnp.float32),
    }
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), tmpl, {"cond": tmpl["cond"]}
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_train_step(model, diffusion, tx, cond_drop_prob=0.1,
                           mesh=mesh)
    sharded = shard_batch(local_batch, mesh)
    state, metrics = step(state, sharded, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    n_dev = len(jax.devices())
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == n_dev, leaf.sharding

    # ---- multi-host FID statistics reduction (SURVEY §5.8): each process
    # accumulates stats over ITS feature shard; after the collective both
    # hold the global (n, mean, cov) — compare against the full-set answer.
    # Shard sizes are deliberately UNEVEN (5 vs 27): a real FID loop's tail
    # batch never divides evenly across hosts
    from sgdm_tpu.eval.metrics import FeatureStats

    feats_global = np.random.default_rng(0).standard_normal((32, 6))
    if nproc == 1:
        bounds = [0, 32]
    else:  # first shard stays the deliberately tiny one (5 samples)
        bounds = [0] + np.linspace(5, 32, nproc).astype(int).tolist()
    mine = FeatureStats()
    mine.append(feats_global[bounds[pid]:bounds[pid + 1]])
    mine.reduce_across_processes()
    want = FeatureStats()
    want.append(feats_global)
    mu_a, cov_a = mine.mean_cov()
    mu_b, cov_b = want.mean_cov()
    assert mine.n == 32
    np.testing.assert_allclose(mu_a, mu_b, atol=1e-6)
    np.testing.assert_allclose(cov_a, cov_b, atol=1e-6)

    # ---- the ACTUAL FID-engine reduction path (eval/fid_engine.py:165
    # `_mu_cov` → reduce_across_processes) driven by real inception
    # features, with one process holding ZERO samples: rank 0 extracts
    # features for all images, every other rank joins the collective
    # empty (the empty-shard zeros branch must not hang or skew)
    from sgdm_tpu.eval.fid_engine import InceptionExtractor, _mu_cov

    imgs = np.random.default_rng(7).integers(
        0, 255, (6, 8, 8, 3), dtype=np.uint8)
    os.environ.pop("SGDM_INCEPTION_WEIGHTS", None)  # deterministic random net
    ext = InceptionExtractor(weights_path=None, seed=0, batch_size=4)
    assert not ext.pretrained
    feats_all = ext.features_from_arrays(imgs, mode="bilinear")["pool3"]
    local = feats_all if pid == 0 else feats_all[:0]
    mu_g, cov_g = _mu_cov(local)  # collective inside
    want2 = FeatureStats()
    want2.append(feats_all)
    mu_w, cov_w = want2.mean_cov()
    np.testing.assert_allclose(mu_g, mu_w, atol=1e-6)
    np.testing.assert_allclose(cov_g, cov_w, atol=1e-6)

    # ---- mini per-process FID sample-dir loop
    sample_dir = os.path.join(outdir, f"test_main{_process_suffix()}")
    os.makedirs(sample_dir, exist_ok=True)
    from PIL import Image

    for i in range(local_bs):
        Image.fromarray(
            np.full((16, 16, 3), 10 * pid + i, np.uint8)
        ).save(os.path.join(sample_dir, f"img{i}.png"))

    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as fh:
        json.dump({
            "pid": pid,
            "slice": [sl.start, sl.stop],
            "loss": loss,
            "n_devices": n_dev,
            "sample_dir": sample_dir,
        }, fh)


if __name__ == "__main__":
    main()
