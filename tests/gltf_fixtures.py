"""In-memory glTF fixture builders for loader tests (no assets in image)."""

from __future__ import annotations

import base64
import json
import struct

import numpy as np


def _buffer_uri(data: bytes) -> str:
    return "data:application/octet-stream;base64," + base64.b64encode(data).decode()


def cornell_box_gltf(light_intensity: float = 20.0) -> dict:
    """Cornell-style box: floor/ceiling/back white, left red, right green wall,
    a perspective camera and a KHR point light. 10 triangles."""
    quads = {
        # name: (4 corners, material)
        "floor": ([(-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1)], 0),
        "ceiling": ([(-1, 2, -1), (-1, 2, 1), (1, 2, 1), (1, 2, -1)], 0),
        "back": ([(-1, 0, -1), (-1, 2, -1), (1, 2, -1), (1, 0, -1)], 0),
        "left": ([(-1, 0, -1), (-1, 0, 1), (-1, 2, 1), (-1, 2, -1)], 1),
        "right": ([(1, 0, -1), (1, 2, -1), (1, 2, 1), (1, 0, 1)], 2),
    }
    positions, indices = [], []
    for corners, _mat in quads.values():
        base = len(positions)
        positions.extend(corners)
        indices.extend([base, base + 1, base + 2, base, base + 2, base + 3])
    pos = np.asarray(positions, np.float32)
    idx = np.asarray(indices, np.uint16)

    pos_bytes = pos.tobytes()
    idx_bytes = idx.tobytes()
    buf = pos_bytes + idx_bytes

    prims = []
    offset = 0
    for i, (corners, mat) in enumerate(quads.values()):
        prims.append({
            "attributes": {"POSITION": 0},
            "indices": 1 + i,
            "material": mat,
        })
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2]}],
        "nodes": [
            {"mesh": 0},
            {"camera": 0, "translation": [0.0, 1.0, 3.9]},
            {"translation": [0.0, 1.9, 0.0],
             "extensions": {"KHR_lights_punctual": {"light": 0}}},
        ],
        "cameras": [{"type": "perspective",
                     "perspective": {"yfov": 0.6911112, "znear": 0.01}}],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "point", "color": [1.0, 1.0, 1.0],
             "intensity": light_intensity},
        ]}},
        "extensionsUsed": ["KHR_lights_punctual"],
        "meshes": [{"primitives": prims}],
        "materials": [
            {"pbrMetallicRoughness": {"baseColorFactor": [0.73, 0.73, 0.73, 1],
                                      "metallicFactor": 0.0,
                                      "roughnessFactor": 1.0}},
            {"pbrMetallicRoughness": {"baseColorFactor": [0.65, 0.05, 0.05, 1],
                                      "metallicFactor": 0.0,
                                      "roughnessFactor": 1.0}},
            {"pbrMetallicRoughness": {"baseColorFactor": [0.12, 0.45, 0.15, 1],
                                      "metallicFactor": 0.0,
                                      "roughnessFactor": 1.0}},
        ],
        "buffers": [{"byteLength": len(buf), "uri": _buffer_uri(buf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_bytes),
             "target": 34962},
            {"buffer": 0, "byteOffset": len(pos_bytes),
             "byteLength": len(idx_bytes), "target": 34963},
        ],
        "accessors": (
            [{"bufferView": 0, "componentType": 5126, "count": len(pos),
              "type": "VEC3",
              "min": pos.min(0).tolist(), "max": pos.max(0).tolist()}]
            + [{"bufferView": 1, "byteOffset": i * 12, "componentType": 5123,
                "count": 6, "type": "SCALAR"} for i in range(len(quads))]
        ),
    }
    return doc


def to_glb(doc: dict) -> bytes:
    """Re-encode a data-URI glTF dict as a GLB container."""
    doc = json.loads(json.dumps(doc))
    bufs = []
    for b in doc.get("buffers", []):
        uri = b.pop("uri")
        bufs.append(base64.b64decode(uri.split(",", 1)[1]))
    assert len(bufs) == 1
    binc = bufs[0]
    binc += b"\x00" * ((4 - len(binc) % 4) % 4)
    jsonc = json.dumps(doc).encode()
    jsonc += b" " * ((4 - len(jsonc) % 4) % 4)
    total = 12 + 8 + len(jsonc) + 8 + len(binc)
    return (struct.pack("<III", 0x46546C67, 2, total)
            + struct.pack("<II", len(jsonc), 0x4E4F534A) + jsonc
            + struct.pack("<II", len(binc), 0x004E4942) + binc)


def write_gltf(path, doc: dict) -> str:
    with open(path, "w") as f:
        json.dump(doc, f)
    return str(path)
