"""Live interactive viewer (viz/live_server.py): the browser-served
replacement for the reference's Pangolin thread (Viewer.cpp:58-180).
Drives the HTTP surface against a real running session: page, live PNGs,
stats, and the menu controls (localization mode toggle = the reference's
menuLocalizationMode, follow camera, reset)."""
import json
import urllib.request

import numpy as np

from jetson_slam_tpu.io.synthetic import make_stereo_sequence

from tests.test_slam_e2e import make_system


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.read()


def _post(port, path):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 method="POST", data=b"")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


def test_live_viewer_serves_and_controls():
    from jetson_slam_tpu.viz.live_server import LiveViewer

    seq = make_stereo_sequence(seed=7, n_frames=10, h=240, w=320,
                               trajectory="arc", n_points=900)
    slam = make_system(seq)
    viewer = LiveViewer(slam, port=0, tile_h=16, tile_w=16, min_period=0.0)
    try:
        for i in range(8):
            state, frame = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                             seq.timestamps[i])
            viewer.update(slam, seq.lefts[i], frame)
        port = viewer.port
        page = _get(port, "/")
        assert b"localization mode" in page and b"follow camera" in page
        png = _get(port, "/frame.png")
        assert png[:8] == b"\x89PNG\r\n\x1a\n" and len(png) > 1000
        png = _get(port, "/map.png")
        assert png[:8] == b"\x89PNG\r\n\x1a\n" and len(png) > 1000
        stats = json.loads(_get(port, "/stats.json"))
        assert stats["state"] == "OK" and stats["frame"] == 8
        assert stats["keyframes"] >= 1 and stats["points"] > 100
        # menu: localization mode toggles the real session flag
        _post(port, "/control?localization=1")
        assert slam.localization_only and slam.tracker.only_tracking
        _post(port, "/control?localization=0")
        assert not slam.localization_only
        _post(port, "/control?follow=0&topdown=1")
        assert not viewer.follow and viewer.map_drawer.top_down
        # reset through the UI rewires a fresh map
        _post(port, "/control?reset=1")
        assert slam.map.n_keyframes() == 0
    finally:
        viewer.close()
        slam.shutdown()
