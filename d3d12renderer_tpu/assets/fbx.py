"""Binary FBX import: node-record parser + geometry extraction.

Reference: src/asset/fbx.cpp (2318 LoC custom binary+ASCII FBX importer) with
src/asset/deflate.cpp decompressing the zlib-packed property arrays.  This
reader parses the full binary node tree (versions 7100-7700), inflates
compressed arrays (stdlib zlib stands in for the reference's hand-written
inflater), extracts Geometry nodes (vertices, polygon indices, normals, UVs
with all mapping modes used in practice), applies the same triangulation as
the reference, and returns the unified ModelAsset.

A matching minimal writer (`write_fbx_geometry`) exists for round-trip tests,
following the reference's debug-dump testing pattern (fbx.cpp:18-20).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .loaders import LoadedMaterial, ModelAsset, generate_normals
from ..render.mesh import MeshData

MAGIC = b"Kaydara FBX Binary  \x00\x1a\x00"


@dataclass
class FBXNode:
    name: str
    properties: List[Any] = field(default_factory=list)
    children: List["FBXNode"] = field(default_factory=list)

    def find(self, name: str) -> Optional["FBXNode"]:
        for c in self.children:
            if c.name == name:
                return c
        return None

    def find_all(self, name: str) -> List["FBXNode"]:
        return [c for c in self.children if c.name == name]


_SCALAR = {
    b"Y": ("<h", 2), b"C": ("<b", 1), b"I": ("<i", 4),
    b"F": ("<f", 4), b"D": ("<d", 8), b"L": ("<q", 8),
}
_ARRAY = {
    b"f": np.float32, b"d": np.float64, b"l": np.int64, b"i": np.int32,
    b"b": np.uint8,
}


def _read_property(buf: bytes, off: int) -> Tuple[Any, int]:
    code = buf[off:off + 1]
    off += 1
    if code in _SCALAR:
        fmt, size = _SCALAR[code]
        return struct.unpack_from(fmt, buf, off)[0], off + size
    if code in _ARRAY:
        n, enc, comp_len = struct.unpack_from("<III", buf, off)
        off += 12
        dtype = _ARRAY[code]
        raw = buf[off:off + comp_len]
        off += comp_len
        if enc == 1:
            raw = zlib.decompress(raw)
        return np.frombuffer(raw, dtype=dtype, count=n), off
    if code == b"S" or code == b"R":
        n = struct.unpack_from("<I", buf, off)[0]
        off += 4
        data = buf[off:off + n]
        off += n
        return (data.decode("utf-8", "replace") if code == b"S" else data), off
    raise ValueError(f"unknown FBX property type {code!r} at {off}")


def _read_node(buf: bytes, off: int, big: bool) -> Tuple[Optional[FBXNode], int]:
    if big:
        end, num_props, _plen = struct.unpack_from("<QQQ", buf, off)
        off += 24
    else:
        end, num_props, _plen = struct.unpack_from("<III", buf, off)
        off += 12
    name_len = buf[off]
    off += 1
    if end == 0 and num_props == 0 and name_len == 0:
        return None, off  # null record (list terminator)
    name = buf[off:off + name_len].decode("utf-8", "replace")
    off += name_len
    node = FBXNode(name)
    for _ in range(num_props):
        prop, off = _read_property(buf, off)
        node.properties.append(prop)
    while off < end:
        child, off = _read_node(buf, off, big)
        if child is None:
            break
        node.children.append(child)
    return node, max(off, end)


def parse_fbx(data: bytes) -> Tuple[FBXNode, int]:
    """Full binary node tree + version."""
    if not data.startswith(MAGIC):
        raise ValueError("not a binary FBX file")
    version = struct.unpack_from("<I", data, len(MAGIC))[0]
    big = version >= 7500
    off = len(MAGIC) + 4
    root = FBXNode("")
    while off < len(data):
        node, off = _read_node(data, off, big)
        if node is None:
            break
        root.children.append(node)
    return root, version


def _triangulate(poly_idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """FBX PolygonVertexIndex -> (T,3) position indices + source polygon-vertex
    slots (for per-polygon-vertex attributes).  Negative entry = XOR'd last
    index of a polygon (reference: fbx.cpp polygon decode)."""
    tris = []
    slots = []
    poly: List[int] = []
    pslots: List[int] = []
    for slot, v in enumerate(poly_idx):
        idx = int(v)
        last = idx < 0
        if last:
            idx = ~idx
        poly.append(idx)
        pslots.append(slot)
        if last:
            for k in range(1, len(poly) - 1):
                tris.append([poly[0], poly[k], poly[k + 1]])
                slots.append([pslots[0], pslots[k], pslots[k + 1]])
            poly, pslots = [], []
    return np.asarray(tris, np.int64), np.asarray(slots, np.int64)


def _layer_values(geom: FBXNode, layer_name: str, value_name: str,
                  index_name: str, width: int):
    """(values (K, width), mapping, per-slot index or None)."""
    layer = geom.find(layer_name)
    if layer is None:
        return None, None, None
    vals = None
    idx = None
    mapping = "ByPolygonVertex"
    for c in layer.children:
        if c.name == value_name:
            vals = np.asarray(c.properties[0], np.float64).reshape(-1, width)
        elif c.name == index_name:
            idx = np.asarray(c.properties[0], np.int64)
        elif c.name == "MappingInformationType":
            mapping = c.properties[0]
    return vals, mapping, idx


def load_fbx(path: str) -> ModelAsset:
    with open(path, "rb") as f:
        data = f.read()
    root, _ = parse_fbx(data)
    objects = root.find("Objects")
    if objects is None:
        raise ValueError("FBX has no Objects node")

    asset = ModelAsset(materials=[LoadedMaterial(name="default")])
    for geom in objects.find_all("Geometry"):
        vnode = geom.find("Vertices")
        inode = geom.find("PolygonVertexIndex")
        if vnode is None or inode is None:
            continue
        verts = np.asarray(vnode.properties[0], np.float64).reshape(-1, 3)
        tris, slots = _triangulate(np.asarray(inode.properties[0], np.int64))

        nvals, nmap, nidx = _layer_values(
            geom, "LayerElementNormal", "Normals", "NormalsIndex", 3)
        uvals, umap, uidx = _layer_values(
            geom, "LayerElementUV", "UV", "UVIndex", 2)

        # Expand to per-triangle-corner vertices (the reference flattens
        # polygon-vertex attributes the same way, fbx.cpp geometry pass).
        pos = verts[tris.reshape(-1)]

        def fetch(vals, mapping, idx, width):
            if vals is None:
                return np.zeros((len(pos), width), np.float32)
            if mapping == "ByPolygonVertex":
                sel = slots.reshape(-1)
                if idx is not None:
                    sel = idx[sel]
                return vals[sel].astype(np.float32)
            if mapping == "ByVertice" or mapping == "ByVertex":
                sel = tris.reshape(-1)
                if idx is not None:
                    sel = idx[sel]
                return vals[sel].astype(np.float32)
            if mapping == "AllSame":
                return np.tile(vals[0], (len(pos), 1)).astype(np.float32)
            raise ValueError(f"unsupported FBX mapping {mapping!r}")

        normals = fetch(nvals, nmap, nidx, 3)
        uvs = fetch(uvals, umap, uidx, 2)
        indices = np.arange(len(pos), dtype=np.int32).reshape(-1, 3)
        mesh = MeshData(pos.astype(np.float32), normals, uvs, indices)
        if nvals is None:
            mesh = generate_normals(mesh)
        asset.meshes.append(mesh)
        asset.mesh_material.append(0)
    return asset


# --------------------------------------------------------------------------
# Minimal writer (round-trip testing, like the reference's debug dumps)
# --------------------------------------------------------------------------

def _write_property(p) -> bytes:
    if isinstance(p, str):
        b = p.encode()
        return b"S" + struct.pack("<I", len(b)) + b
    if isinstance(p, (int, np.integer)):
        return b"L" + struct.pack("<q", int(p))
    if isinstance(p, float):
        return b"D" + struct.pack("<d", p)
    if isinstance(p, np.ndarray):
        code = {np.dtype(np.float64): b"d", np.dtype(np.int32): b"i",
                np.dtype(np.int64): b"l", np.dtype(np.float32): b"f"}[p.dtype]
        raw = p.tobytes()
        comp = zlib.compress(raw)
        return (code + struct.pack("<III", p.size, 1, len(comp)) + comp)
    raise TypeError(type(p))


def _write_node(node: FBXNode, offset: int) -> bytes:
    props = b"".join(_write_property(p) for p in node.properties)
    kids = b""
    name = node.name.encode()
    header_len = 13 + len(name)
    body_start = offset + header_len + len(props)
    if node.children:
        pos = body_start
        for c in node.children:
            blob = _write_node(c, pos)
            kids += blob
            pos += len(blob)
        kids += b"\x00" * 13  # null terminator record
    end = body_start + len(kids)
    return (struct.pack("<III", end, len(node.properties), len(props))
            + bytes([len(name)]) + name + props + kids)


def write_fbx_geometry(path: str, positions: np.ndarray, indices: np.ndarray,
                       normals: Optional[np.ndarray] = None,
                       uvs: Optional[np.ndarray] = None):
    """Write a minimal version-7400 binary FBX with one Geometry node."""
    poly = []
    for tri in indices:
        poly += [int(tri[0]), int(tri[1]), ~int(tri[2])]

    geom = FBXNode("Geometry", [1000001, "Geometry::mesh", "Mesh"])
    geom.children.append(FBXNode(
        "Vertices", [np.asarray(positions, np.float64).reshape(-1)]))
    geom.children.append(FBXNode(
        "PolygonVertexIndex", [np.asarray(poly, np.int32)]))
    if normals is not None:
        layer = FBXNode("LayerElementNormal", [0])
        layer.children.append(FBXNode("MappingInformationType", ["ByVertice"]))
        layer.children.append(FBXNode(
            "Normals", [np.asarray(normals, np.float64).reshape(-1)]))
        geom.children.append(layer)
    if uvs is not None:
        layer = FBXNode("LayerElementUV", [0])
        layer.children.append(FBXNode("MappingInformationType", ["ByVertice"]))
        layer.children.append(FBXNode(
            "UV", [np.asarray(uvs, np.float64).reshape(-1)]))
        geom.children.append(layer)

    objects = FBXNode("Objects")
    objects.children.append(geom)

    blob = MAGIC + struct.pack("<I", 7400)
    pos = len(blob)
    for top in [objects]:
        node_blob = _write_node(top, pos)
        blob += node_blob
        pos += len(node_blob)
    blob += b"\x00" * 13
    with open(path, "wb") as f:
        f.write(blob)
