"""HTTP inference host (spcl_tpu/serving.py::make_http_server): round-trip
numerics against a direct flax apply, input coercion, error paths."""
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spcl_tpu.models import UNet
from spcl_tpu.serving import (_prepare_input, export_inference,
                              make_http_server, save_artifact)

SIZE = 32


@pytest.fixture(scope="module")
def server_and_model(tmp_path_factory):
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, SIZE, SIZE, 1), jnp.float32),
                           train=False)
    path = str(tmp_path_factory.mktemp("art") / "m.spclx")
    save_artifact(path, export_inference(model, variables, height=SIZE,
                                         width=SIZE, platforms=("cpu",)),
                  extra_meta={"num_classes": 4})
    server = make_http_server(path, host="127.0.0.1", port=0)  # ephemeral
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", model, variables
    server.shutdown()


def _post(url, arr, query=""):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url + "/predict" + query,
                                 data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.read()


def test_meta_and_health(server_and_model):
    url, _, _ = server_and_model
    with urllib.request.urlopen(url + "/meta", timeout=60) as r:
        meta = json.loads(r.read())
    assert meta["num_classes"] == 4
    assert meta["input_shape"] == ["b", str(SIZE), str(SIZE), "1"]
    with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
        assert json.loads(r.read()) == {"ok": True}


def test_predict_matches_direct_apply(server_and_model):
    url, model, variables = server_and_model
    x = np.random.default_rng(0).random((3, SIZE, SIZE, 1), dtype=np.float32)
    ref = np.asarray(model.apply(variables, jnp.asarray(x), train=False)["logits"])

    pred = np.load(io.BytesIO(_post(url, x)))
    assert pred.shape == (3, SIZE, SIZE) and pred.dtype == np.int32
    assert np.array_equal(pred, np.argmax(ref, axis=-1))

    logits = np.load(io.BytesIO(_post(url, x, "?outputs=logits")))
    np.testing.assert_allclose(logits, ref, atol=1e-5)

    both = np.load(io.BytesIO(_post(url, x, "?outputs=both")))
    assert set(both.files) == {"pred", "logits"}
    assert np.array_equal(both["pred"], pred)


def test_predict_coercions(server_and_model):
    """[H,W] f32 and uint8 requests: batch squeezed back, uint8 scaled /255
    (identical answer to the pre-scaled float request)."""
    url, _, _ = server_and_model
    rng = np.random.default_rng(1)
    x8 = rng.integers(0, 256, (SIZE, SIZE), dtype=np.uint8)
    pred8 = np.load(io.BytesIO(_post(url, x8)))
    assert pred8.shape == (SIZE, SIZE)  # unbatched in -> unbatched out
    predf = np.load(io.BytesIO(_post(url, x8.astype(np.float32) / 255.0)))
    assert np.array_equal(pred8, predf)


def test_predict_rejects_bad_input(server_and_model):
    url, _, _ = server_and_model
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, np.zeros((2, SIZE + 1, SIZE, 1), np.float32))
    assert e.value.code == 400
    assert "does not match artifact" in json.loads(e.value.read())["error"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, np.zeros((2, SIZE, SIZE, 1), np.float32), "?outputs=junk")
    assert e.value.code == 400


def test_prepare_input_shapes():
    meta = {"input_shape": ["b", "8", "8", "2"]}
    x, squeeze = _prepare_input(np.zeros((8, 8, 2), np.float32), meta)
    assert x.shape == (1, 8, 8, 2) and squeeze  # [H,W,C] -> batched
    x, squeeze = _prepare_input(np.zeros((3, 8, 8), np.float32),
                                {"input_shape": ["b", "8", "8", "1"]})
    assert x.shape == (3, 8, 8, 1) and not squeeze  # [B,H,W] -> channel added
    with pytest.raises(ValueError, match="pinned batch"):
        _prepare_input(np.zeros((3, 8, 8, 2), np.float32),
                       {"input_shape": ["2", "8", "8", "2"]})
