"""`.pwn` cloud file IO — the reference's on-disk cloud format.

``pwn_core/cloud.cpp:25-137``: header line ``PWNCLOUD N binary``, a t2v
6-vector line for the stored sensor pose, then per-point records of
(point, normal, stats). ASCII records are ``POINTWITHSTATS`` + 3 + 3 + 16
floats (the Stats 4x4 matrix: columns 0-2 = covariance eigenvectors,
column 3 = the window mean as a homogeneous point). Binary records dump the
C++ structs: Point (4 floats, w=1), Normal (4 floats, w=0), Stats (the 4x4
matrix, 64 bytes, followed by the trailing members ``int _n``,
``Vector3f _eigenValues``, ``bool _curvatureComputed``, ``float _curvature``
padded to the struct's 16-byte alignment => 96 bytes, offsets 64/68/80/84).

The binary layout matches the reference's x86-64 struct padding (verified
by construction: 64 + 4 + 12 + 1 + 3 pad + 4 + 8 tail pad). Round-trip of
our own writer/reader is tested in both modes.
"""
from __future__ import annotations

import numpy as np

from ..utils import lie
from .cloud import Cloud
from .converter import ConverterConfig

_STATS_BYTES = 96
_REC_BYTES = 16 + 16 + _STATS_BYTES


def save_pwn(path, cloud: Cloud, T=None, step: int = 1, binary: bool = True):
    """Write a Cloud (valid pixels only) in the reference `.pwn` format."""
    import jax.numpy as jnp

    valid = np.asarray(cloud.valid).reshape(-1)
    pts = np.asarray(cloud.p).reshape(3, -1).T[valid][::step]
    nrm = np.asarray(cloud.n).reshape(3, -1).T[valid][::step]
    ev = np.asarray(cloud.ev).reshape(3, -1).T[valid][::step]
    evec = np.asarray(cloud.evec).reshape(3, 3, -1)  # [k, i, pix]
    evec = np.moveaxis(evec, -1, 0)[valid][::step]  # (N, k, i)
    curv = np.asarray(cloud.curv).reshape(-1)[valid][::step]
    n = len(pts)

    T6 = np.zeros(6, np.float32)
    if T is not None:
        T6 = np.asarray(lie.se3_t2v(jnp.asarray(T, jnp.float32)), np.float32)

    stats = np.zeros((n, 4, 4), np.float32)
    for k in range(3):
        stats[:, :3, k] = evec[:, k, :]  # column k = eigenvector k
    stats[:, :3, 3] = pts  # mean ~ point
    stats[:, 3, 3] = 1.0

    with open(path, "wb") as fh:
        fh.write(f"PWNCLOUD {n} {int(binary)}\n".encode())
        fh.write((" ".join(f"{v:g}" for v in T6) + " \n").encode())
        if not binary:
            lines = []
            for i in range(n):
                vals = list(pts[i]) + list(nrm[i]) + [
                    stats[i, r, c] for r in range(4) for c in range(4)
                ]
                lines.append(
                    "POINTWITHSTATS " + " ".join(f"{v:g}" for v in vals) + " "
                )
            fh.write(("\n".join(lines) + "\n").encode())
        else:
            rec = np.zeros((n, _REC_BYTES), np.uint8)
            rec[:, 0:12] = pts.astype("<f4").view(np.uint8).reshape(n, 12)
            rec[:, 12:16] = np.frombuffer(
                np.float32(1.0).tobytes(), np.uint8
            )  # point w = 1
            rec[:, 16:28] = nrm.astype("<f4").view(np.uint8).reshape(n, 12)
            # normal w = 0 (already zero)
            # stats matrix: Eigen default column-major
            mat = np.transpose(stats, (0, 2, 1)).reshape(n, 16)  # col-major
            rec[:, 32:96] = mat.astype("<f4").view(np.uint8).reshape(n, 64)
            # trailing members: _n (int), _eigenValues, _curvatureComputed,
            # _curvature
            rec[:, 96:100] = np.zeros((n, 1), "<i4").view(np.uint8)
            rec[:, 100:112] = ev.astype("<f4").view(np.uint8).reshape(n, 12)
            rec[:, 112] = 1  # curvatureComputed
            rec[:, 116:120] = curv.astype("<f4").view(np.uint8).reshape(n, 4)
            fh.write(rec.tobytes())


def load_pwn(path):
    """Read a `.pwn` file -> dict of (N, ...) arrays + the stored pose T."""
    import jax.numpy as jnp

    with open(path, "rb") as fh:
        header = fh.readline().split()
        assert header[0] == b"PWNCLOUD", "not a PWNCLOUD file"
        n, binary = int(header[1]), bool(int(header[2]))
        T6 = np.array([float(v) for v in fh.readline().split()], np.float32)
        T = np.asarray(lie.se3_v2t(jnp.asarray(T6)))
        if binary:
            raw = np.frombuffer(fh.read(n * _REC_BYTES), np.uint8).reshape(
                n, _REC_BYTES
            )
            pts = raw[:, 0:12].copy().view("<f4").reshape(n, 3)
            nrm = raw[:, 16:28].copy().view("<f4").reshape(n, 3)
            mat = raw[:, 32:96].copy().view("<f4").reshape(n, 4, 4)
            mat = np.transpose(mat, (0, 2, 1))  # back from column-major
            ev = raw[:, 100:112].copy().view("<f4").reshape(n, 3)
            curv = raw[:, 116:120].copy().view("<f4").reshape(n)
        else:
            pts = np.zeros((n, 3), np.float32)
            nrm = np.zeros((n, 3), np.float32)
            mat = np.zeros((n, 4, 4), np.float32)
            ev = np.zeros((n, 3), np.float32)
            curv = np.zeros(n, np.float32)
            for i in range(n):
                tok = fh.readline().split()
                if not tok or tok[0] != b"POINTWITHSTATS":
                    continue
                vals = np.array([float(v) for v in tok[1:23]], np.float32)
                pts[i] = vals[0:3]
                nrm[i] = vals[3:6]
                mat[i] = vals[6:22].reshape(4, 4)
                lam = np.zeros(3, np.float32)  # ASCII stores no eigenvalues
                ev[i] = lam
                s = lam.sum()
                curv[i] = lam[0] / s if s > 0 else 1.0
    return {"points": pts, "normals": nrm, "stats": mat, "eigenvalues": ev,
            "curvature": curv, "T": T}


def cloud_from_pwn(path, config: ConverterConfig = ConverterConfig()) -> Cloud:
    """Load a `.pwn` file as a (1, N) image-organized Cloud, recomputing the
    information matrices from the stored eigen frames exactly as the
    converter does (``informationmatrixcalculator.cpp:9-59``)."""
    import jax.numpy as jnp

    from ..ops import sym6

    d = load_pwn(path)
    n = len(d["points"])
    p = jnp.asarray(d["points"].T[:, None, :])  # (3, 1, N)
    nrm = jnp.asarray(d["normals"].T[:, None, :])
    lam = jnp.asarray(d["eigenvalues"].T[:, None, :])
    curv = jnp.asarray(d["curvature"][None, :])
    # eigenvector columns from the stats matrices
    V = tuple(
        tuple(jnp.asarray(d["stats"][:, i, k][None, :]) for i in range(3))
        for k in range(3)
    )
    flat = curv < config.curvature_threshold
    inv_lam = tuple(1.0 / jnp.maximum(lam[k], 1e-7) for k in range(3))
    diag = tuple(
        jnp.where(flat, config.point_flat_info[k], inv_lam[k]) for k in range(3)
    )
    has_n = (nrm**2).sum(0) > 0
    hn = has_n.astype(jnp.float32)
    op = hn[None] * sym6.sym_from_diag_frame(V, diag)
    z = jnp.zeros_like(curv)
    nf, nn = config.normal_flat_info, config.normal_nonflat_info
    on_diag = tuple(jnp.where(flat, nf[k], nn[k]) * hn for k in range(3))
    on = jnp.stack([on_diag[0], z, z, on_diag[1], z, on_diag[2]])
    evec = jnp.stack([V[k][i] for k in range(3) for i in range(3)])
    return Cloud(
        p=p, n=nrm, curv=curv, ev=lam, evec=evec, op=op, on=on,
        valid=jnp.ones((1, n), bool),
    )
