"""Add missing collision geometries to a URDF (reference
scripts/process_urdf.py), using ElementTree instead of urdfpy.

Input must end with .bk; writes the processed file without the suffix.
Links without collisions get a copy of their first visual, or a 5cm
sphere if they have no visuals either.
"""

import sys
import xml.etree.ElementTree as ET
import copy

path = sys.argv[1]
assert path[-3:] == ".bk"

tree = ET.parse(path)
root = tree.getroot()

for link in root.findall("link"):
    if link.find("collision") is not None:
        continue
    visual = link.find("visual")
    if visual is not None:
        col = ET.SubElement(link, "collision")
        origin = visual.find("origin")
        if origin is not None:
            col.append(copy.deepcopy(origin))
        geom = visual.find("geometry")
        if geom is not None:
            col.append(copy.deepcopy(geom))
    else:
        col = ET.SubElement(link, "collision")
        geom = ET.SubElement(col, "geometry")
        sph = ET.SubElement(geom, "sphere")
        sph.set("radius", "0.05")

tree.write(path[:-3])
print("wrote", path[:-3])
