"""Serving export/predict/server tests (CPU platform, tiny model).

Covers the beyond-reference serving subsystem: jax.export round-trip
equality against the in-process forward, bucketed/padded batching, the
checkpoint->export CLI, the dynamic batcher under concurrency, and the
HTTP endpoint end-to-end.
"""
import json
import threading
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from slim_switch_moe_vit_tpu import create_model
from slim_switch_moe_vit_tpu.serving import (
    DynamicBatcher,
    export_model,
    load_predictor,
    make_serve_fn,
    make_server,
)
from slim_switch_moe_vit_tpu.train_state import create_train_state

IMG, NCLS = 32, 10


@pytest.fixture(scope="module")
def tiny_export(tmp_path_factory):
    model = create_model("deit_tiny_patch16_224", num_classes=NCLS,
                         img_size=IMG, dtype=jnp.float32)
    state = create_train_state(model, (1, IMG, IMG, 3), seed=3)
    out = str(tmp_path_factory.mktemp("artifact"))
    manifest = export_model(model, state.params, out, batch_sizes=(2, 4),
                            model_name="deit_tiny_patch16_224")
    return model, state.params, out, manifest


def _rand_images(n, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, (n, IMG, IMG, 3)).astype(np.uint8)


def test_export_roundtrip_matches_direct_forward(tiny_export):
    model, params, out, manifest = tiny_export
    assert manifest["batch_sizes"] == [2, 4]
    assert manifest["input_dtype"] == "uint8"

    pred = load_predictor(out)
    x = _rand_images(4)
    got = pred.predict(x)

    serve = make_serve_fn(model)
    want = np.asarray(serve({"params": params}, jnp.asarray(x)), np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.shape == (4, NCLS)


def test_ragged_request_pads_and_chunks(tiny_export):
    model, params, out, _ = tiny_export
    pred = load_predictor(out)
    serve = make_serve_fn(model)
    for n in (1, 2, 3, 5, 7, 9):
        x = _rand_images(n, seed=n)
        got = pred.predict(x)
        want = np.asarray(serve({"params": params}, jnp.asarray(x)), np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"n={n}")
    # single image without the batch dim
    got = pred.predict(_rand_images(1)[0])
    assert got.shape == (1, NCLS)
    # top-k is softmax-normalized and sorted
    cls, scores = pred.top_k(_rand_images(3), k=3)
    assert cls.shape == (3, 3) and scores.shape == (3, 3)
    assert np.all(np.diff(scores, axis=1) <= 1e-7)
    assert np.all(scores > 0) and np.all(scores.sum(1) <= 1.0 + 1e-5)


def test_export_cli_from_checkpoint(tmp_path):
    from slim_switch_moe_vit_tpu.serving.export import main as export_main
    from slim_switch_moe_vit_tpu.utils.checkpoint import save_checkpoint

    model = create_model("deit_tiny_patch16_224", num_classes=NCLS,
                         img_size=IMG, dtype=jnp.float32)
    state = create_train_state(model, (1, IMG, IMG, 3), seed=5, use_ema=True)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=1)

    out = str(tmp_path / "artifact")
    export_main([
        "--model", "deit_tiny_patch16_224", "--output", out,
        "--checkpoint", ckpt, "--use-ema", "--num-classes", str(NCLS),
        "--img-size", str(IMG), "--dtype", "float32", "--batch-sizes", "2",
    ])
    pred = load_predictor(out)
    x = _rand_images(2, seed=9)
    want = np.asarray(make_serve_fn(model)({"params": state.ema_params}, jnp.asarray(x)),
                      np.float32)
    np.testing.assert_allclose(pred.predict(x), want, rtol=1e-5, atol=1e-5)


def test_dynamic_batcher_concurrent_requests(tiny_export):
    _, _, out, _ = tiny_export
    pred = load_predictor(out)
    batcher = DynamicBatcher(pred, max_wait_ms=20.0)
    try:
        sequential = [pred.predict(_rand_images(1, seed=i)) for i in range(6)]
        results = [None] * 6

        def worker(i):
            results[i] = batcher.predict(_rand_images(1, seed=i))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for i in range(6):
            np.testing.assert_allclose(results[i], sequential[i],
                                       rtol=1e-5, atol=1e-5)
    finally:
        batcher.close()


def test_dynamic_batcher_fans_out_errors(tiny_export):
    """A malformed request fails ALONE at submit (shape validated before
    coalescing, so it can't poison co-batched requests) and the worker
    stays alive for the next batch."""
    _, _, out, _ = tiny_export
    pred = load_predictor(out)
    batcher = DynamicBatcher(pred, max_wait_ms=20.0)
    try:
        # bad request raises ValueError at submit...
        with pytest.raises(ValueError, match="does not match"):
            batcher.predict(np.zeros((1, 7, 7, 3), np.uint8))
        # ...even when racing a valid one (the valid one must succeed)
        results, errors = [None], [None]

        def good():
            results[0] = batcher.predict(_rand_images(1))

        def bad():
            try:
                batcher.predict(np.zeros((2, 7, 7, 3), np.uint8))
            except ValueError as e:
                errors[0] = e

        tg, tb = threading.Thread(target=good), threading.Thread(target=bad)
        tg.start(); tb.start()
        tg.join(timeout=60); tb.join(timeout=60)
        assert results[0] is not None and results[0].shape == (1, NCLS)
        assert isinstance(errors[0], ValueError)
    finally:
        batcher.close()
    # predict after close fails fast instead of hanging forever
    with pytest.raises(RuntimeError, match="closed"):
        batcher.predict(_rand_images(1))


def test_batcher_respects_max_batch(tiny_export):
    """Coalescing never exceeds max_batch: an overflow request is carried
    into the NEXT batch, and every request still gets its own rows back."""
    _, _, out, _ = tiny_export
    pred = load_predictor(out)
    batcher = DynamicBatcher(pred, max_batch=4, max_wait_ms=50.0)
    seen = []
    real_predict = pred.predict

    def spy(images):
        seen.append(images.shape[0])
        return real_predict(images)

    pred.predict = spy
    try:
        sizes = [3, 3, 3]
        results = [None] * len(sizes)

        def worker(i):
            results[i] = batcher.predict(_rand_images(sizes[i], seed=i))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(sizes))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, n in enumerate(sizes):
            want = real_predict(_rand_images(n, seed=i))
            np.testing.assert_allclose(results[i], want, rtol=1e-5,
                                       atol=1e-5)
        assert seen and max(seen) <= 4, f"coalesced over max_batch: {seen}"
    finally:
        batcher.close()


def test_http_server_returns_500_on_predict_failure(tmp_path):
    """Runtime predict failures are 5xx (retryable, visible to monitoring),
    not 400."""
    class FakePredictor:
        manifest = {"model_name": "fake", "platform": "cpu",
                    "batch_sizes": [4], "input_dtype": "uint8",
                    "img_size": IMG, "num_classes": NCLS}
        batch_sizes = [4]

        def predict(self, images):
            raise RuntimeError("device fell over")

    server, batcher = make_server(FakePredictor(), port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = json.dumps(
            {"instances": _rand_images(1).tolist()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=body,
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "device fell over" in e.read().decode()
    finally:
        server.shutdown()
        batcher.close()


def test_export_cli_use_ema_requires_ema(tmp_path):
    """--use-ema on an EMA-less checkpoint must refuse, not silently export
    the raw weights."""
    from slim_switch_moe_vit_tpu.serving.export import main as export_main
    from slim_switch_moe_vit_tpu.utils.checkpoint import save_checkpoint

    model = create_model("deit_tiny_patch16_224", num_classes=NCLS,
                         img_size=IMG, dtype=jnp.float32)
    state = create_train_state(model, (1, IMG, IMG, 3))  # no EMA
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=0)
    with pytest.raises(ValueError, match="EMA"):
        export_main([
            "--model", "deit_tiny_patch16_224", "--output",
            str(tmp_path / "a"), "--checkpoint", ckpt, "--use-ema",
            "--num-classes", str(NCLS), "--img-size", str(IMG),
            "--dtype", "float32", "--batch-sizes", "2",
        ])


def test_http_server_end_to_end(tiny_export):
    _, _, out, _ = tiny_export
    pred = load_predictor(out)
    server, batcher = make_server(pred, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/health", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["batch_sizes"] == [2, 4]

        x = _rand_images(3, seed=2)
        body = json.dumps({"instances": x.tolist()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            resp = json.loads(r.read())
        got = np.asarray(resp["predictions"], np.float32)
        np.testing.assert_allclose(got, pred.predict(x), rtol=1e-4,
                                   atol=1e-4)

        body = json.dumps({"instances": x.tolist(), "k": 2}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            resp = json.loads(r.read())
        assert np.asarray(resp["classes"]).shape == (3, 2)

        # malformed request -> 400, server stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=b"not json",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # invalid k values -> 400 (negative would otherwise slice wrong;
        # non-int would surface as a 500)
        for bad_k in (-1, 0, "two"):
            body = json.dumps({"instances": x.tolist(), "k": bad_k}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/predict", data=body,
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(req, timeout=60)
                raise AssertionError(f"expected HTTP 400 for k={bad_k!r}")
            except urllib.error.HTTPError as e:
                assert e.code == 400, (bad_k, e.code)
    finally:
        server.shutdown()
        batcher.close()


def test_gated_model_export_carries_gates(tmp_path):
    """resmoe models keep learned thresholds in a 'gates' collection — the
    export must bundle them exactly as engine.make_eval_step feeds them."""
    import jax

    model = create_model("resmoe_tiny_patch16_224_expert8", num_classes=NCLS,
                         img_size=IMG, dtype=jnp.float32)
    state = create_train_state(model, (1, IMG, IMG, 3), seed=7)
    assert state.gates, "resmoe must expose a gates collection"
    # eval uses target_threshold (skip when gate prob > target); init probs
    # sit near 0.5, so dropping targets to 0.3 flips most tokens to skipped —
    # a dropped gates payload would be caught by the equality check below
    def lower_targets(tree):
        if isinstance(tree, dict):
            return {k: (jnp.asarray(0.3, jnp.float32)
                        if k == "target_threshold" else lower_targets(v))
                    for k, v in tree.items()}
        return tree

    gates = lower_targets(jax.tree.map(lambda g: g, state.gates))

    out = str(tmp_path / "artifact")
    export_model(model, state.params, out, gates=gates, batch_sizes=(2,),
                 model_name="resmoe_tiny_patch16_224_expert8")
    pred = load_predictor(out)
    x = _rand_images(2, seed=4)
    want = np.asarray(
        make_serve_fn(model)({"params": state.params, "gates": gates},
                             jnp.asarray(x)), np.float32)
    np.testing.assert_allclose(pred.predict(x), want, rtol=1e-5, atol=1e-5)
    baseline = np.asarray(
        make_serve_fn(model)({"params": state.params, "gates": state.gates},
                             jnp.asarray(x)), np.float32)
    assert not np.allclose(want, baseline), (
        "perturbed thresholds should change the forward — otherwise this "
        "test cannot detect a dropped gates payload")


def test_export_cli_resizes_pos_embed(tmp_path):
    """Export at a different resolution than the checkpoint (the reference's
    finetune-at-384 story): pos-embed grid resizes bicubically at load."""
    from slim_switch_moe_vit_tpu.serving.export import main as export_main
    from slim_switch_moe_vit_tpu.utils.checkpoint import save_checkpoint

    model32 = create_model("deit_tiny_patch16_224", num_classes=NCLS,
                           img_size=IMG, dtype=jnp.float32)
    state = create_train_state(model32, (1, IMG, IMG, 3), seed=5)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=0)

    out = str(tmp_path / "artifact64")
    export_main([
        "--model", "deit_tiny_patch16_224", "--output", out,
        "--checkpoint", ckpt, "--num-classes", str(NCLS),
        "--img-size", "64", "--dtype", "float32", "--batch-sizes", "2",
    ])
    pred = load_predictor(out)
    assert pred.manifest["img_size"] == 64
    imgs = np.random.RandomState(1).randint(
        0, 256, (2, 64, 64, 3)).astype(np.uint8)
    logits = pred.predict(imgs)
    assert logits.shape == (2, NCLS)
    assert np.all(np.isfinite(logits))


def test_platform_mismatch_is_rejected(tiny_export, tmp_path):
    _, _, out, _ = tiny_export
    import shutil

    clone = str(tmp_path / "clone")
    shutil.copytree(out, clone)
    m = json.load(open(f"{clone}/manifest.json"))
    m["platform"] = "tpu"
    json.dump(m, open(f"{clone}/manifest.json", "w"))
    with pytest.raises(ValueError, match="platform"):
        load_predictor(clone)
