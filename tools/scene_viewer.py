"""Standalone HTML scene viewer — the web half of the editor substitute.

Reference: the editor's hierarchy/inspector/aux-texture panels
(src/editor/editor.cpp, editor.h:45-51).  This generates a single
self-contained HTML file with: the entity tree and all components, physics
compilation stats, orbiting path-traced views, and the intermediate render
targets (AO / shadow / normals / depth) the reference exposes as panels.

Usage:
  python tools/scene_viewer.py scene.yaml [--out scene.html] [--size 256]
      [--views 4] [--spp 6] [--platform cpu|axon]
"""

import argparse
import base64
import html
import io
import math
import sys

parser = argparse.ArgumentParser()
parser.add_argument("scene", help="scene YAML file")
parser.add_argument("--out", default=None)
parser.add_argument("--size", type=int, default=256)
parser.add_argument("--views", type=int, default=4)
parser.add_argument("--spp", type=int, default=6)
parser.add_argument("--platform", default="cpu")
parser.add_argument("--backend", default=None, choices=["dense", "pallas"],
                    help="ray backend; default pallas on axon")
parser.add_argument("--orbit-radius", type=float, default=None)
args = parser.parse_args()
if args.backend is None:
    args.backend = "pallas" if args.platform == "axon" else "dense"

import jax

jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
import numpy as np
from PIL import Image

from d3d12renderer_tpu.render import bvh as _bvh_mod
from d3d12renderer_tpu.scene.scene import Scene

_bvh_mod.set_ray_backend(args.backend)


def png_b64(arr_u8) -> str:
    img = Image.fromarray(np.asarray(arr_u8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def gray_u8(x):
    x = np.asarray(x, np.float64)
    finite = x[np.isfinite(x)]
    lo = finite.min() if finite.size else 0.0
    hi = finite.max() if finite.size else 1.0
    x = np.nan_to_num(x, nan=hi, posinf=hi, neginf=lo)
    n = (x - lo) / max(hi - lo, 1e-9)
    return (np.clip(n, 0, 1) * 255).astype(np.uint8)


scene = Scene.load_yaml(args.scene)
arch, state, mapping = scene.compile_physics()
rscene = scene.build_render_scene(body_state=state, mapping=mapping)

# Scene bounds -> orbit radius.
tv = np.asarray(rscene.bvh.tri_v0[np.asarray(rscene.bvh.tri_valid)])
center = tv.mean(0) if len(tv) else np.zeros(3)
radius = args.orbit_radius or (
    float(2.2 * np.linalg.norm(tv - center, axis=-1).max())
    if len(tv) else 10.0)

from d3d12renderer_tpu.render.camera import look_at
from d3d12renderer_tpu.render.gbuffer import render_gbuffer
from d3d12renderer_tpu.render.pathtracer import (
    PathTracerSettings, render, to_srgb_u8,
)

views = []
aux = []
for i in range(args.views):
    ang = 2 * math.pi * i / args.views
    eye = center + np.array([math.cos(ang) * radius, radius * 0.5,
                             math.sin(ang) * radius])
    cam = look_at(eye=tuple(eye), target=tuple(center + [0, 0.5, 0]),
                  aspect=1.0, v_fov=math.radians(50))
    img = render(rscene, cam, args.size, args.size,
                 PathTracerSettings(recursion_depth=2), spp=args.spp,
                 key=jax.random.PRNGKey(i))
    views.append((f"orbit {i * 360 // args.views}&deg;",
                  png_b64(to_srgb_u8(img))))
    if i == 0:
        # Aux buffers from the first view (the editor's texture panels).
        gb = render_gbuffer(rscene, cam, args.size, args.size)
        from d3d12renderer_tpu.render import post
        ao = post.hbao(gb.view_pos, gb.view_normal)
        aux = [
            ("normals", png_b64(((np.asarray(gb.normal) * 0.5 + 0.5)
                                 * 255).astype(np.uint8))),
            ("depth", png_b64(gray_u8(np.asarray(gb.depth)))),
            ("object id", png_b64(gray_u8(np.asarray(gb.object_id)))),
            ("AO", png_b64(gray_u8(np.asarray(ao)))),
        ]

# Entity tree.
rows = []
for ent, _ in scene.view():
    comps = [k for k in scene._components if ent.has(k)]
    detail = []
    for k in comps:
        v = ent.get(k)
        if k == "transform":
            detail.append(
                f"transform: pos={tuple(round(float(x), 3) for x in v.position)}")
        elif k == "collider":
            for c in v:
                detail.append(f"collider: {c.shape} size={tuple(c.size)}")
        else:
            detail.append(f"{k}: {html.escape(str(v)[:120])}")
    rows.append((ent.id, ent.name, comps, detail))

total_pairs = sum(b.body_a.shape[0] for b in arch.contact_buckets)
joints = [(t.kind, t.body_a.shape[0]) for t in arch.joints]

parts = [f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(args.scene)}</title><style>
body {{ font: 13px/1.5 system-ui, sans-serif; margin: 24px; background: #16181d; color: #d7dae0; }}
h1, h2 {{ font-weight: 600; }} code {{ color: #9ecbff; }}
.imgs img {{ image-rendering: pixelated; margin: 4px; border: 1px solid #333; }}
.cap {{ color: #8a8f98; font-size: 11px; text-align: center; }}
table {{ border-collapse: collapse; }} td, th {{ padding: 2px 10px; border-bottom: 1px solid #2a2d34; text-align: left; vertical-align: top; }}
details {{ margin-left: 8px; }} .cell {{ display: inline-block; }}
</style></head><body>
<h1>Scene: <code>{html.escape(args.scene)}</code></h1>
<h2>Views (path traced)</h2><div class="imgs">"""]
for cap, b64 in views:
    parts.append(f'<span class="cell"><img width="{args.size}" '
                 f'src="data:image/png;base64,{b64}"><div class="cap">{cap}'
                 f'</div></span>')
parts.append('</div><h2>Render targets (first view)</h2><div class="imgs">')
for cap, b64 in aux:
    parts.append(f'<span class="cell"><img width="{args.size}" '
                 f'src="data:image/png;base64,{b64}"><div class="cap">{cap}'
                 f'</div></span>')
parts.append(f"""</div>
<h2>Physics</h2>
<p>{arch.num_bodies} bodies &middot; {arch.num_colliders} colliders &middot;
{arch.num_planes} planes &middot; {arch.num_terrains} terrains &middot;
{arch.vs_plane_collider.shape[0]} plane rows &middot; {total_pairs} pair rows
&middot; joints: {", ".join(f"{n} {k}" for k, n in joints) or "none"}</p>
<h2>Entities ({len(rows)})</h2><table>
<tr><th>id</th><th>name</th><th>components</th></tr>""")
for eid, name, comps, detail in rows:
    d = "<br>".join(html.escape(x) if not x.startswith("transform")
                    else x for x in detail)
    parts.append(f"<tr><td>{eid}</td><td>{html.escape(name)}</td>"
                 f"<td><details><summary>{', '.join(comps)}</summary>"
                 f"{d}</details></td></tr>")
parts.append("</table></body></html>")

out = args.out or (args.scene.rsplit(".", 1)[0] + ".html")
with open(out, "w") as f:
    f.write("".join(parts))
print(f"wrote {out} ({len(rows)} entities, {len(views)} views)")
