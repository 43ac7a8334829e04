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


# ---------------------------------------------------------------------------
# Exported-artifact numeric parity — the reference's export oracle
# (torch-vs-ONNX assert_close at rtol=atol=0.01, project/smoke.py:145,216,
# 280) reproduced against the DESERIALIZED artifacts, one per exported
# program (encoder / decoder / segmenter / full stylize).
# ---------------------------------------------------------------------------

def _roundtrip(blob):
    from jax import export as jexport

    return jexport.deserialize(blob).call


def test_exported_encoder_decoder_parity(rng):
    from vstnet_tpu.config import RevResNetConfig
    from vstnet_tpu.models.revresnet import (
        decode,
        encode,
        init_revresnet,
        latent_shape,
    )
    from vstnet_tpu.runtime.export import export_decoder, export_encoder

    cfg = RevResNetConfig(n_blocks=(1, 1, 1))
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    h, w = 24, 32

    blob, zshape = export_encoder(params, cfg, h, w, serialized=True)
    x = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
    got = np.asarray(_roundtrip(blob)(x))
    assert got.shape == zshape
    np.testing.assert_allclose(
        got, np.asarray(encode(params, x, cfg)), rtol=0.01, atol=0.01)

    blob, oshape = export_decoder(params, cfg, h, w, serialized=True)
    z = jnp.asarray(
        rng.standard_normal((1, *latent_shape(cfg, h, w))) * 0.1, jnp.float32)
    got = np.asarray(_roundtrip(blob)(z))
    assert got.shape == oshape
    np.testing.assert_allclose(
        got, np.asarray(decode(params, z, cfg)), rtol=0.01, atol=0.01)


def test_exported_stylize_parity(rng):
    from vstnet_tpu.config import RevResNetConfig
    from vstnet_tpu.models import cwct
    from vstnet_tpu.models.revresnet import decode, encode, init_revresnet
    from vstnet_tpu.runtime.export import export_stylize

    cfg = RevResNetConfig(n_blocks=(1, 1, 1))
    params = init_revresnet(jax.random.PRNGKey(1), cfg)
    blob, _ = export_stylize(params, cfg, 16, 16, serialized=True)
    c = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    got = np.asarray(_roundtrip(blob)(c, s))
    ref = np.asarray(
        decode(params, cwct.transfer(encode(params, c, cfg),
                                     encode(params, s, cfg)), cfg))
    np.testing.assert_allclose(got, ref, rtol=0.01, atol=0.01)


def test_exported_segmenter_parity(rng):
    """Native-tier segmenter artifact (reference runs the full SegFormer in
    its C++ tier, project/ggml/src/segformer.h:858-923; ONNX twin
    smoke.py:222-284): deserialized module must reproduce the live mask."""
    from vstnet_tpu.models.segformer import init_segformer, segment_mask
    from vstnet_tpu.runtime.export import export_segmenter

    seg_params = init_segformer(jax.random.PRNGKey(2))
    h = w = 64
    blob, mshape = export_segmenter(seg_params, h, w, serialized=True)
    x = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
    got = np.asarray(_roundtrip(blob)(x))
    assert got.shape == mshape and got.dtype == np.int32
    ref = np.asarray(segment_mask(seg_params, x))
    # integer class ids — exact equality expected from the same backend
    np.testing.assert_array_equal(got, ref)


def test_exported_segment_render_parity(rng):
    """Segment-render artifact (the reference native binary's whole job,
    main.cpp:75-98 + segment.cpp:38-137, here fully in-graph with the
    palette baked): deserialized module must reproduce the live
    segment -> self-remap -> palette -> blend composition exactly."""
    from vstnet_tpu.models.remapping import (
        ade20k_palette,
        load_label_mapping,
        self_remapping,
    )
    from vstnet_tpu.models.segformer import init_segformer, segment_mask
    from vstnet_tpu.runtime.export import export_segment_render

    seg_params = init_segformer(jax.random.PRNGKey(3))
    h = w = 64
    blob, oshape = export_segment_render(seg_params, h, w, blend=0.5,
                                         serialized=True)
    x = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
    got = np.asarray(_roundtrip(blob)(x))
    assert got.shape == oshape

    m = self_remapping(segment_mask(seg_params, x), load_label_mapping(),
                       0.02)
    pal = jnp.asarray(ade20k_palette(), jnp.float32) / 255.0
    color = pal[jnp.clip(m, 0, pal.shape[0] - 1)]
    ref = np.asarray(jnp.clip(0.5 * color + 0.5 * x, 0.0, 1.0))
    np.testing.assert_allclose(got, ref, rtol=0.01, atol=0.01)
    # outputs are renderable images in [0, 1]
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_profiling_trace_and_memory(tmp_path):
    """runtime/profiling: a jitted call under trace() writes a capture,
    and the static memory analysis reports the compiled buffer sizes
    (the analogue of the GGML engine's compute-buffer dump,
    ggml_engine.h:553-556)."""
    import jax
    import jax.numpy as jnp

    from vstnet_tpu.runtime.profiling import (
        compiled_memory_analysis,
        format_memory_report,
        trace,
    )

    fn = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64), jnp.float32)

    logdir = tmp_path / "trace"
    with trace(str(logdir)):
        fn(x).block_until_ready()
    captured = list(logdir.rglob("*.pb")) + list(logdir.rglob("*.json.gz")) \
        + list(logdir.rglob("*.xplane.pb"))
    assert captured, f"no trace artifacts under {logdir}"

    mem = compiled_memory_analysis(fn, x)
    if mem is not None:  # backend-dependent; must not crash either way
        assert mem.get("arguments", 1) >= 0

    report = format_memory_report(fn=fn, args=(x,))
    assert isinstance(report, str) and report


def test_export_cli(tmp_path, monkeypatch):
    """vstnet-export writes runnable artifacts end-to-end: a stylize
    module exported by the CLI deserializes... no — the CLI writes raw
    StableHLO for PJRT; assert the files exist, carry the @main signature
    with the right shapes, and that flag validation works."""
    import pytest

    from vstnet_tpu.cli.export import main

    paths = main(["--what", "stylize", "--height", "16", "--width", "16",
                  "--platform", "cpu", "-o", str(tmp_path)])
    assert len(paths) == 1 and paths[0].endswith("stylize_16x16.mlir")
    text = open(paths[0]).read()
    assert "@main" in text and "tensor<1x16x16x3xf32>" in text

    with pytest.raises(SystemExit, match="multiples of 4"):
        main(["--height", "30", "--width", "16"])
