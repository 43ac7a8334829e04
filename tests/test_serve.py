"""HTTP stylization service (vstnet_tpu/serve.py): endpoints, shape
bucketing, request coalescing, and error paths — all on a tiny model."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstnet_tpu.config import RevResNetConfig
from vstnet_tpu.models.pipeline import StyleModel
from vstnet_tpu.models.revresnet import init_revresnet
from vstnet_tpu.serve import StyleService, serve

SMALL = RevResNetConfig(n_blocks=(1, 1, 1), hidden_dim=16, sp_steps=2)


def _png_bytes(rng, h, w):
    from PIL import Image

    arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    model = StyleModel(
        cfg=SMALL, params=init_revresnet(jax.random.PRNGKey(0), SMALL))
    service = StyleService(model, fast=False, grid=32, max_size=256,
                           max_batch=4, batch_window_ms=30.0)
    httpd = serve(service, host="127.0.0.1", port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, service
    httpd.shutdown()


def _put(url, data):
    req = urllib.request.Request(url, data=data, method="PUT")
    return urllib.request.urlopen(req, timeout=120)


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    return urllib.request.urlopen(req, timeout=120)


def test_healthz_and_registration(server, rng):
    base, service = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok" and info["mode"] == "photorealistic"
    # on the 8-device virtual mesh the worker runs the SHARDED programs
    assert info["devices"] == len(jax.devices())
    assert info["sharded"] == (len(jax.devices()) > 1)

    with _put(base + "/styles/wave", _png_bytes(rng, 48, 40)) as r:
        assert json.loads(r.read())["registered"] == "wave"
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert "wave" in json.loads(r.read())["styles"]
    # factors are shape-independent (c, c) algebra
    ls, mu = service.styles["wave"]
    c = SMALL.latent_channels
    assert ls.shape[-2:] == (c, c)


def test_stylize_roundtrip_and_bucketing(server, rng):
    """A non-bucket-multiple content comes back at its own size (the
    service pads to the 32-px bucket and crops back)."""
    from PIL import Image

    base, service = server
    _put(base + "/styles/s1", _png_bytes(rng, 40, 40)).close()

    with _post(base + "/stylize?style=s1", _png_bytes(rng, 44, 52)) as r:
        assert r.headers["Content-Type"] == "image/png"
        out = Image.open(io.BytesIO(r.read()))
    assert out.size == (52, 44)  # PIL size is (W, H)


def test_unknown_style_404(server, rng):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/stylize?style=nope", _png_bytes(rng, 32, 32))
    assert ei.value.code == 404
    assert "nope" in json.loads(ei.value.read())["error"]


def test_bad_image_400(server, rng):
    base, _ = server
    _put(base + "/styles/s2", _png_bytes(rng, 32, 32)).close()
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/stylize?style=s2", b"this is not an image")
    assert ei.value.code == 400


def test_concurrent_requests_coalesce(server, rng):
    """Same-size concurrent requests all succeed and produce per-request
    outputs (the worker batches them into one device program)."""
    from PIL import Image

    base, service = server
    _put(base + "/styles/s3", _png_bytes(rng, 32, 32)).close()

    payloads = [_png_bytes(rng, 64, 64) for _ in range(4)]
    results = [None] * 4

    def go(i):
        with _post(base + "/stylize?style=s3", payloads[i]) as r:
            results[i] = r.read()

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for data in results:
        img = Image.open(io.BytesIO(data))
        assert img.size == (64, 64)
    # distinct inputs -> distinct stylized outputs (no cross-request mixup)
    assert len({d for d in results}) == 4


def test_service_direct_batch_matches_single(rng):
    """The coalesced batch path is numerically identical to a lone
    request: stylize the same content alone and alongside batch-mates."""
    model = StyleModel(
        cfg=SMALL, params=init_revresnet(jax.random.PRNGKey(1), SMALL))
    service = StyleService(model, fast=False, grid=32, max_size=256,
                           max_batch=4, batch_window_ms=50.0)
    style = _png_bytes(rng, 32, 32)
    service.register_style("s", style)

    content = _png_bytes(rng, 32, 32)
    solo = service.stylize(content, "s")

    outs = [None] * 3

    def go(i, data):
        outs[i] = service.stylize(data, "s")

    others = [_png_bytes(rng, 32, 32) for _ in range(2)]
    threads = [threading.Thread(target=go, args=(0, content))] + [
        threading.Thread(target=go, args=(i + 1, others[i]))
        for i in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert outs[0] == solo  # identical PNG bytes


def test_concurrent_style_registration_is_safe(rng):
    """Registrations race the batch worker's reads: with the registry
    lock, every request stylizes against a complete (ls, mu) pair."""
    model = StyleModel(
        cfg=SMALL, params=init_revresnet(jax.random.PRNGKey(2), SMALL))
    service = StyleService(model, fast=False, grid=32, max_size=256,
                           max_batch=4, batch_window_ms=5.0)
    service.register_style("base", _png_bytes(rng, 32, 32))
    content = _png_bytes(rng, 32, 32)
    errs = []

    def register(i):
        try:
            service.register_style(f"s{i}", _png_bytes(rng, 32, 32))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def request():
        try:
            service.stylize(content, "base")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = ([threading.Thread(target=register, args=(i,))
                for i in range(4)]
               + [threading.Thread(target=request) for _ in range(4)])
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs
    assert set(service.style_names()) == {"base", "s0", "s1", "s2", "s3"}
