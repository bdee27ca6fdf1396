"""HTML scene viewer smoke test (the editor-substitute inspection surface;
reference: editor panels, src/editor/editor.cpp + editor.h:45-51; live-serve
loop: editor update/undo, src/editor/editor.cpp:247 + undo_stack.h:6-40).
"""

import json
import re
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

from tests.test_scene import build_demo_scene


@pytest.mark.slow
def test_scene_viewer_generates_html(tmp_path):
    s = build_demo_scene()
    yml = str(tmp_path / "scene.yaml")
    s.save_yaml(yml)
    out = str(tmp_path / "scene.html")
    proc = subprocess.run(
        [sys.executable, "tools/scene_viewer.py", yml, "--out", out,
         "--size", "64", "--views", "2", "--spp", "2"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    doc = open(out).read()
    imgs = re.findall(r"base64,([A-Za-z0-9+/=]+)\"", doc)
    assert len(imgs) == 6          # 2 orbit views + 4 aux buffers
    assert "Ball" in doc and "GroundVis" in doc and "Sun" in doc
    assert "collider: sphere" in doc
    assert "1 bodies" in doc and "1 colliders" in doc


@pytest.mark.slow
def test_scene_viewer_serve_loop():
    """Live loop: orbit re-render -> PNG, component inspection, transform
    edit through the undo stack (undo + redo observable via /entities)."""
    proc = subprocess.Popen(
        [sys.executable, "tools/scene_viewer.py", "--demo", "--serve",
         "--port", "0", "--size", "64", "--spp", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        line = proc.stdout.readline()
        m = re.search(r"http://127\.0\.0\.1:(\d+)/", line)
        assert m, f"no serve banner: {line!r} / {proc.stderr.read()[-500:]}"
        base = f"http://127.0.0.1:{m.group(1)}"

        def get(path):
            return urllib.request.urlopen(base + path, timeout=300).read()

        def post(path, doc=None):
            req = urllib.request.Request(
                base + path, method="POST",
                data=json.dumps(doc).encode() if doc else b"",
                headers={"Content-Type": "application/json"},
            )
            return json.loads(urllib.request.urlopen(req, timeout=60).read())

        assert b"scene viewer" in get("/")
        png = get("/render?size=64&spp=1&theta=0.3&phi=0.5")
        assert png[:4] == b"\x89PNG"
        # A different orbit angle must re-render (different image bytes).
        png2 = get("/render?size=64&spp=1&theta=2.1&phi=0.5")
        assert png2[:4] == b"\x89PNG" and png2 != png
        for kind in ("normals", "depth", "ao"):
            assert get(f"/render?size=64&kind={kind}")[:4] == b"\x89PNG"

        ents = json.loads(get("/entities"))
        red = next(e for e in ents if e["name"] == "RedSphere")
        assert red["position"][0] == pytest.approx(0.0)

        post("/edit", {"id": red["id"], "position": [3.0, 0.8, 0.0]})
        ents = json.loads(get("/entities"))
        red = next(e for e in ents if e["name"] == "RedSphere")
        assert red["position"][0] == pytest.approx(3.0)
        # The edited scene renders (BVH rebuilt from the moved transform).
        assert get("/render?size=64&spp=1")[:4] == b"\x89PNG"

        assert post("/undo")["undone"] == "edit RedSphere"
        ents = json.loads(get("/entities"))
        red = next(e for e in ents if e["name"] == "RedSphere")
        assert red["position"][0] == pytest.approx(0.0)

        assert post("/redo")["redone"] == "edit RedSphere"
        ents = json.loads(get("/entities"))
        red = next(e for e in ents if e["name"] == "RedSphere")
        assert red["position"][0] == pytest.approx(3.0)

        info = json.loads(get("/info"))
        assert info["radius"] > 0 and info["undo"] == "edit RedSphere"

        post("/undo")  # back to the authored transform (y = 2.2, above rest)

        # Play mode: clone + physics step per render (reference editor
        # play/pause/stop with scene cloning, src/scene/scene.h:399-463).
        # RedSphere starts above its rest height — after some played frames
        # the CLONE's sphere has fallen (frames render differently), while
        # /entities (the editor scene) still reports the authored transform.
        assert post("/play")["mode"] == "play"
        first = get("/render?size=64&spp=1")
        for _ in range(11):
            assert get("/render?size=64&spp=1")[:4] == b"\x89PNG"
        later = get("/render?size=64&spp=1")
        assert later != first, "play frames should show motion"
        frames = json.loads(get("/info"))["frames"]
        assert frames >= 13
        assert post("/pause")["mode"] == "pause"
        get("/render?size=64&spp=1")
        assert json.loads(get("/info"))["frames"] == frames  # pause = frozen
        # Edits are blocked during play/pause.
        try:
            post("/edit", {"id": red["id"], "position": [0, 9, 0]})
            raise AssertionError("edit during play should fail")
        except urllib.error.HTTPError as e:
            assert e.code == 500
        assert post("/stop")["mode"] == "edit"
        ents = json.loads(get("/entities"))
        red2 = next(e for e in ents if e["name"] == "RedSphere")
        assert red2["position"][1] == pytest.approx(2.2)

        # Component editing beyond transforms (reference: the inspector
        # edits every component, editor.cpp): material params with undo.
        red_det = red2["detail"]["material"]
        assert red_det["albedo"][0] == pytest.approx(0.75)
        post("/edit", {"id": red2["id"], "component": "material",
                       "index": None, "fields": {"albedo": [0.1, 0.9, 0.1],
                                                 "roughness": 0.9}})
        ents = json.loads(get("/entities"))
        red3 = next(e for e in ents if e["name"] == "RedSphere")
        assert red3["detail"]["material"]["albedo"][1] == pytest.approx(0.9)
        assert post("/undo")["undone"] == "edit RedSphere"
        ents = json.loads(get("/entities"))
        red3 = next(e for e in ents if e["name"] == "RedSphere")
        assert red3["detail"]["material"]["albedo"][0] == pytest.approx(0.75)

        # Constraint motor editing DURING PLAY: retargeting the paddle's
        # hinge motor must change the very next physics steps (reference:
        # live constraint editing in the inspector, editor.cpp).
        ents = json.loads(get("/entities"))
        paddle = next(e for e in ents if e["name"] == "Paddle")
        assert paddle["detail"]["joint"][0]["motor_target"] == 0.0
        assert post("/play")["mode"] == "play"
        for _ in range(3):
            get("/render?size=64&spp=1")
        ph = json.loads(get("/physics"))
        w0 = ph["bodies"][str(paddle["id"])]["ang_vel"][1]
        assert abs(w0) < 0.5, f"paddle should be still, spins at {w0}"
        post("/edit", {"id": paddle["id"], "component": "joint", "index": 0,
                       "fields": {"motor_target": 6.0}})
        for _ in range(8):
            get("/render?size=64&spp=1")
        ph = json.loads(get("/physics"))
        w1 = ph["bodies"][str(paddle["id"])]["ang_vel"][1]
        # Solver convention: a velocity motor drives the RELATIVE angular
        # velocity (b - a) about the hinge axis to the target, so body a
        # (the paddle, against a kinematic post) spins at -target.
        assert abs(w1) > 2.0, f"motor retarget must spin the paddle, got {w1}"
        post("/stop")
        # The editor scene holds the edited target (undoable).
        ents = json.loads(get("/entities"))
        paddle = next(e for e in ents if e["name"] == "Paddle")
        assert paddle["detail"]["joint"][0]["motor_target"] == 6.0
        assert post("/undo")["undone"] == "edit Paddle"
        ents = json.loads(get("/entities"))
        paddle = next(e for e in ents if e["name"] == "Paddle")
        assert paddle["detail"]["joint"][0]["motor_target"] == 0.0
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
