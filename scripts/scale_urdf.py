"""Uniformly rescale a URDF (reference scripts/scale_urdf.py), using
ElementTree instead of urdfpy.

Input must end with .bk; writes the rescaled file without the suffix.
Scales collision/visual origins + box sizes + sphere radii and joint
origins. scale=2 for human, 2.5 for wolf (reference comment).
"""

import sys
import xml.etree.ElementTree as ET

import numpy as np

path = sys.argv[1]
assert path[-3:] == ".bk"
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0


def scale_origin(elem):
    if elem is None or not elem.get("xyz"):
        return
    xyz = np.fromstring(elem.get("xyz"), sep=" ") * scale
    elem.set("xyz", " ".join("%g" % v for v in xyz))


def scale_geometry(geom):
    if geom is None:
        return
    box = geom.find("box")
    if box is not None:
        size = np.fromstring(box.get("size"), sep=" ") * scale
        box.set("size", " ".join("%g" % v for v in size))
    sph = geom.find("sphere")
    if sph is not None:
        sph.set("radius", "%g" % (float(sph.get("radius")) * scale))
    cyl = geom.find("cylinder")
    if cyl is not None:
        cyl.set("radius", "%g" % (float(cyl.get("radius")) * scale))
        cyl.set("length", "%g" % (float(cyl.get("length")) * scale))


tree = ET.parse(path)
root = tree.getroot()

for link in root.findall("link"):
    for tag in ("collision", "visual"):
        for inst in link.findall(tag):
            scale_origin(inst.find("origin"))
            scale_geometry(inst.find("geometry"))

for joint in root.findall("joint"):
    scale_origin(joint.find("origin"))

tree.write(path[:-3])
print("wrote", path[:-3])
