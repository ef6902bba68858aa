"""gelPhantom dynamic cone-beam CT (CIL-equivalent loader).

Reference: ``trips/utilities/cil_io.py:35-224`` parses the Helsinki
gel-phantom .mat bundles (Zenodo 3696817) and builds CIL ``Cone2D``
projection operators. CIL's Cone2D geometry is the planar fan-beam geometry
our native projector already implements (source distance / detector
distance / detector pixel size), so the operator here is a native fan-beam
CSR with the metadata-supplied geometry — no CIL dependency.

Downloads are gated (no network egress); files must exist locally.
"""
from __future__ import annotations

import numpy as np

from .dynamic import _download
from .projector import fan_beam_matrix


def _mat_struct(path):
    import scipy.io as spio

    return spio.loadmat(path, struct_as_record=False, squeeze_me=True)


def read_gel_frame(path):
    """Parse one gel-phantom frame: sinogram + scan geometry metadata
    (reference cil_io.py:35-149)."""
    f = _mat_struct(path)
    key = [k for k in f if not k.startswith("__")][0]
    rec = f[key]
    sino = np.asarray(rec.sinogram, dtype=float)
    params = rec.parameters
    geom = {
        "distanceSourceDetector": float(params.distanceSourceDetector),
        "distanceSourceOrigin": float(params.distanceSourceOrigin),
        "geometricMagnification": float(params.geometricMagnification),
        "numDetectors": int(params.numDetectors),
        "pixelSize": float(params.pixelSize),
        "angles": np.asarray(params.angles, dtype=float),
    }
    return sino, geom


def gel_operator(geom, nx, angle_subsample=1):
    """Native fan-beam (Cone2D-equivalent) matrix for a gel-phantom frame.

    CIL's create_Cone2D(source_position=[0, -dso], detector_position=
    [0, dod]) with detector spacing p maps onto our fan geometry directly;
    distances are expressed in image-pixel units (the reconstruction pixel
    size is dso * p_eff / dsd for an nx-wide grid).
    """
    dso = geom["distanceSourceOrigin"]
    dsd = geom["distanceSourceDetector"]
    p = geom["numDetectors"]
    pix = geom["pixelSize"]
    # express distances in units of reconstruction pixels
    fov = p * pix / geom["geometricMagnification"]
    pixel = fov / nx
    angles = np.deg2rad(geom["angles"][::angle_subsample])
    return fan_beam_matrix(
        nx,
        angles=angles,
        det_count=p,
        det_width=pix / pixel,
        source_origin=dso / pixel,
        origin_det=(dsd - dso) / pixel,
    )


def generate_gelPhantom(nx=256, nt=17, angle_subsample=1,
                        data_dir="./data/gelphantom_data"):
    """Load all gel-phantom frames into block operators
    (reference cil_io.py:156-224). Returns (A, b, AA, B, nx, nx, nt)."""
    from scipy import sparse as sp

    frames = []
    for i in range(1, nt + 1):
        path = f"{data_dir}/GelPhantomData_b4_frame{i}.mat"
        _download(
            "https://zenodo.org/record/3696817/files/GelPhantomData_b4.mat",
            path,
        )
        frames.append(read_gel_frame(path))
    AA, B = [], []
    for sino, geom in frames:
        A_t = gel_operator(geom, nx, angle_subsample)
        AA.append(sp.csr_matrix(A_t))
        B.append(sino[::angle_subsample].reshape(-1))
    A = sp.block_diag(AA, format="csr")
    b = np.concatenate(B)
    return A, b, AA, B, nx, nx, nt
