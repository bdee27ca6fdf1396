"""HTML scene viewer smoke test (the editor-substitute inspection surface;
reference: editor panels, src/editor/editor.cpp + editor.h:45-51).
"""

import re
import subprocess
import sys

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
