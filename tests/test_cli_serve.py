"""Serving CLI (cli/serve.py) + serving persistence surface.

No reference equivalent (the reference's only query path is the batch eval
script); these pin the deployment workflow: gallery index save/load, query
ingestion from video/dir/image, the JSON API, and the dataset-free
--synthetic demo end-to-end.
"""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from seam_match_rcnn_tpu.config import (EvalConfig, ModelConfig, RPNConfig,
                                        RoIHeadsConfig, TransformConfig)
from seam_match_rcnn_tpu.data.synthetic import make_synthetic_movingfashion
from seam_match_rcnn_tpu.serving import (Gallery, RetrievalResult,
                                         decode_video_frames)


def _tiny_model_config():
    return ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_test=60, post_nms_top_n_test=80),
        roi_heads=RoIHeadsConfig(detections_per_img=6),
        transform=TransformConfig(min_size=96, max_size=128),
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def mf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_cli")
    path = make_synthetic_movingfashion(str(root), n_products=3, n_frames=6)
    return str(root), path


def test_gallery_save_load_roundtrip(tmp_path):
    g = Gallery(match_feats=np.random.RandomState(0).randn(4, 256).astype(np.float32),
                aggr_feats=np.random.RandomState(1).randn(4, 256).astype(np.float32),
                keys=["a", "b", "c", "d"])
    path = g.save(str(tmp_path / "idx"))       # extension appended
    assert path.endswith(".npz") and os.path.exists(path)
    g2 = Gallery.load(path)
    np.testing.assert_array_equal(g.match_feats, g2.match_feats)
    np.testing.assert_array_equal(g.aggr_feats, g2.aggr_feats)
    assert g2.keys == g.keys


def test_load_query_frames_video_dir_image(mf_root, tmp_path):
    import cv2

    from seam_match_rcnn_tpu.cli.serve import load_query_frames

    root, annots = mf_root
    with open(annots) as f:
        data = json.load(f)
    vid = os.path.join(root, data[sorted(data)[0]]["video_paths"][0])

    frames = load_query_frames(vid, n_frames=4)
    assert len(frames) >= 1
    assert frames[0].ndim == 3 and frames[0].dtype == np.float32
    assert 0.0 <= frames[0].min() and frames[0].max() <= 1.0

    # directory of frames
    d = tmp_path / "frames"
    d.mkdir()
    for i, fr in enumerate(frames[:2]):
        cv2.imwrite(str(d / f"{i:03d}.jpg"), (fr[:, :, ::-1] * 255).astype(np.uint8))
    dir_frames = load_query_frames(str(d), n_frames=8)
    assert len(dir_frames) == 2

    # single image
    one = load_query_frames(str(d / "000.jpg"), n_frames=8)
    assert len(one) == 1

    # empty directory -> loud error
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError):
        load_query_frames(str(empty), n_frames=2)


def test_decode_video_frames_bad_path(tmp_path):
    with pytest.raises(ValueError):
        decode_video_frames(str(tmp_path / "missing.mp4"), 3)


class _FakeRetriever:
    """Stands in for SeamRetrieval in the HTTP test: returns a fixed
    ranking, records the frames it was handed."""

    def __init__(self):
        self.calls = []

    def retrieve(self, frames, gallery, k=5):
        self.calls.append(len(frames))
        k = min(k, len(gallery.keys))
        return RetrievalResult(indices=np.arange(k),
                               scores=np.linspace(0.9, 0.1, k),
                               keys=gallery.keys[:k], track_length=len(frames))

    def detect(self, frames, with_masks=True):
        self.calls.append(len(frames))
        outs = []
        for fr in frames:
            h, w = fr.shape[:2]
            o = {"boxes": np.asarray([[2.0, 3.0, 20.0, 30.0],
                                      [0.0, 0.0, 1.0, 1.0]], np.float32),
                 "scores": np.asarray([0.9, 0.1], np.float32),
                 "labels": np.asarray([1, 2], np.int32),
                 "valid": np.asarray([True, False])}
            if with_masks:
                m = np.zeros((2, h, w), np.float32)
                m[0, 5:25, 4:15] = 0.8
                o["masks"] = m
            outs.append(o)
        return outs


def test_http_server_endpoints(mf_root):
    from seam_match_rcnn_tpu.cli.serve import make_http_server

    root, annots = mf_root
    with open(annots) as f:
        data = json.load(f)
    vid = os.path.join(root, data[sorted(data)[0]]["video_paths"][0])

    gallery = Gallery(np.zeros((3, 256), np.float32),
                      np.zeros((3, 256), np.float32), keys=["p0", "p1", "p2"])
    retr = _FakeRetriever()
    server = make_http_server(retr, gallery, "127.0.0.1", 0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        health = json.load(urllib.request.urlopen(f"{base}/healthz", timeout=10))
        assert health["status"] == "ok" and health["gallery_size"] == 3

        prods = json.load(urllib.request.urlopen(f"{base}/v1/products", timeout=10))
        assert prods["keys"] == ["p0", "p1", "p2"]

        body = json.dumps({"video": vid, "topk": 2, "n_frames": 3}).encode()
        req = urllib.request.Request(f"{base}/v1/query", data=body,
                                     headers={"Content-Type": "application/json"})
        out = json.load(urllib.request.urlopen(req, timeout=30))
        assert out["keys"] == ["p0", "p1"] and len(out["scores"]) == 2
        assert retr.calls and retr.calls[0] >= 1

        # served errors come back as 400 JSON, process stays alive
        bad = urllib.request.Request(f"{base}/v1/query", data=b"{}",
                                     headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=10)
        assert ei.value.code == 400
        assert "error" in json.load(ei.value)
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=5)


def test_http_detect_endpoint(mf_root):
    """POST /v1/detect returns per-frame boxes + RLE full-image masks that
    round-trip through ops.rle.decode (the reference's postprocessed eval
    detector output as a service)."""
    from seam_match_rcnn_tpu.cli.serve import make_http_server
    from seam_match_rcnn_tpu.ops import rle as rle_mod

    root, annots = mf_root
    with open(annots) as f:
        data = json.load(f)
    vid = os.path.join(root, data[sorted(data)[0]]["video_paths"][0])

    gallery = Gallery(np.zeros((3, 256), np.float32),
                      np.zeros((3, 256), np.float32), keys=["p0", "p1", "p2"])
    server = make_http_server(_FakeRetriever(), gallery, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"video": vid, "n_frames": 2,
                           "score_threshold": 0.5}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/detect", data=body,
            headers={"Content-Type": "application/json"})
        out = json.load(urllib.request.urlopen(req, timeout=30))
        assert len(out["frames"]) >= 1
        fr = out["frames"][0]
        # the valid=False / below-threshold row was filtered
        assert fr["boxes"] == [[2.0, 3.0, 20.0, 30.0]]
        assert fr["labels"] == [1] and fr["mask_threshold"] == 0.5
        mask = rle_mod.decode(fr["masks_rle"][0])
        assert mask.shape == tuple(fr["masks_rle"][0]["size"])
        assert mask[10, 10] == 1 and mask[0, 0] == 0
        assert int(mask.sum()) == 20 * 11
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=5)


def test_serve_synthetic_end_to_end(monkeypatch, capsys):
    """`python -m ...cli.serve --synthetic`: builds a fixture, indexes its
    gallery, answers one video query — with the tiny model config swapped
    in so the CPU compile stays test-sized."""
    from seam_match_rcnn_tpu.cli import serve

    monkeypatch.setattr(serve, "serving_model_config", _tiny_model_config)
    result = serve.main(["--synthetic", "--topk", "2"])
    assert isinstance(result, RetrievalResult)
    assert 1 <= len(result.keys) <= 2
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["keys"] == list(result.keys)
    assert payload["track_length"] >= 1
    # the gallery index was persisted and is loadable
    assert any("gallery index" in line for line in out)


def test_http_media_root_restriction(mf_root):
    """--media_root: request paths resolve relative to the root and
    escapes (absolute or ..) are rejected with a 400, closing the
    filesystem-probe oracle on non-loopback binds."""
    from seam_match_rcnn_tpu.cli.serve import make_http_server

    root, annots = mf_root
    with open(annots) as f:
        data = json.load(f)
    rel_vid = data[sorted(data)[0]]["video_paths"][0]

    gallery = Gallery(np.zeros((3, 256), np.float32),
                      np.zeros((3, 256), np.float32), keys=["p0", "p1", "p2"])
    server = make_http_server(_FakeRetriever(), gallery, "127.0.0.1", 0,
                              media_root=root)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"

        def post(body):
            req = urllib.request.Request(
                f"{base}/v1/query", data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            return json.load(urllib.request.urlopen(req, timeout=30))

        # relative path inside the root works
        out = post({"video": rel_vid, "topk": 1, "n_frames": 2})
        assert out["keys"] == ["p0"]

        # escapes are rejected without touching the filesystem
        for bad in ({"video": "../../../etc/hostname"},
                    {"frames_dir": "../.."}):
            req = urllib.request.Request(
                f"{base}/v1/query", data=json.dumps(bad).encode(),
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=10)
            assert ei.value.code == 400
            assert "escapes" in json.load(ei.value)["error"]
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=5)
