"""VTK XML export of voxel instances.

Equivalent of ``export_to_vtk`` (``/root/reference/src/io.rs:59-137``): the
3-D view's voxel instances become a ``.vtu`` unstructured grid of vertex
cells with per-point RGB vectors and an Opacity scalar, loadable in
ParaView. Written by hand (no VTK dependency) as ascii XML.
"""

from __future__ import annotations

import numpy as np


def export_to_vtk(
    positions: np.ndarray,  # (N, 3) float
    colors: np.ndarray,  # (N, 4) float rgba
    filename: str,
):
    positions = np.asarray(positions, np.float64).reshape(-1, 3)
    colors = np.asarray(colors, np.float64).reshape(-1, 4)
    n = positions.shape[0]
    if colors.shape[0] != n:
        raise ValueError("positions and colors must have the same length")

    def fmt(arr, per_line=6):
        flat = np.asarray(arr).reshape(-1)
        return "\n".join(
            " ".join(f"{v:.9g}" for v in flat[i : i + per_line])
            for i in range(0, len(flat), per_line)
        )

    connectivity = np.arange(n, dtype=np.int64)
    offsets = np.arange(1, n + 1, dtype=np.int64)
    types = np.full(n, 1, np.uint8)  # VTK_VERTEX

    xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="1.0" byte_order="BigEndian">
  <UnstructuredGrid>
    <Piece NumberOfPoints="{n}" NumberOfCells="{n}">
      <Points>
        <DataArray type="Float64" NumberOfComponents="3" format="ascii">
{fmt(positions)}
        </DataArray>
      </Points>
      <Cells>
        <DataArray type="Int64" Name="connectivity" format="ascii">
{fmt(connectivity)}
        </DataArray>
        <DataArray type="Int64" Name="offsets" format="ascii">
{fmt(offsets)}
        </DataArray>
        <DataArray type="UInt8" Name="types" format="ascii">
{fmt(types)}
        </DataArray>
      </Cells>
      <PointData Vectors="RGB" Scalars="Opacity">
        <DataArray type="Float64" Name="RGB" NumberOfComponents="3" format="ascii">
{fmt(colors[:, :3])}
        </DataArray>
        <DataArray type="Float64" Name="Opacity" NumberOfComponents="1" format="ascii">
{fmt(colors[:, 3])}
        </DataArray>
      </PointData>
    </Piece>
  </UnstructuredGrid>
</VTKFile>
"""
    with open(filename, "w") as f:
        f.write(xml)
