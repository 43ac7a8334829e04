"""Runtime utilities: shape buckets, export, timing."""

import jax
import jax.numpy as jnp
import numpy as np

from vstnet_tpu.runtime.buckets import (
    BucketedStylizer,
    bucket_hw,
    crop_from_bucket,
    pad_to_bucket,
)


def test_bucket_hw():
    assert bucket_hw(500, 513) == (512, 576)
    assert bucket_hw(512, 512) == (512, 512)
    assert bucket_hw(4000, 4000, max_hw=(2048, 2048)) == (2048, 2048)


def test_pad_crop_roundtrip(rng):
    x = jnp.asarray(rng.uniform(size=(1, 250, 300, 3)), jnp.float32)
    p, hw = pad_to_bucket(x)
    assert p.shape[1] % 64 == 0 and p.shape[2] % 64 == 0
    back = crop_from_bucket(p, hw)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_bucketed_stylizer_counts_compiles(rng):
    from vstnet_tpu.config import RevResNetConfig
    from vstnet_tpu.models.pipeline import StyleModel
    from vstnet_tpu.models.revresnet import init_revresnet

    cfg = RevResNetConfig(n_blocks=(1, 1, 1))
    model = StyleModel(cfg=cfg,
                       params=init_revresnet(jax.random.PRNGKey(0), cfg))
    stylizer = BucketedStylizer(model, grid=32)
    shapes = [(40, 56), (44, 52), (60, 40), (36, 60)]
    for h, w in shapes:
        c = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
        s = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
        out = stylizer(c, s)
        assert out.shape == (1, h, w, 3)


def test_export_stylize_produces_mlir():
    from vstnet_tpu.config import RevResNetConfig
    from vstnet_tpu.models.revresnet import init_revresnet
    from vstnet_tpu.runtime.export import export_stylize

    cfg = RevResNetConfig(n_blocks=(1, 1, 1))
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    mlir, out_shape = export_stylize(params, cfg, 16, 16)
    assert out_shape == (1, 16, 16, 3)
    text = mlir.decode()
    assert "stablehlo" in text or "mhlo" in text or "func.func" in text
    assert len(mlir) > 1000
