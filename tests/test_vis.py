"""MFEM-format output round-trip and GLVis streaming.

The decisive writer test: serialize a structured mesh (with its L2
lattice nodes) to MFEM mesh v1.0, reload it through the GENERAL mesh
loader (native parser), run the same problem on both, and require
identical results to round-off."""

import os
import socket
import threading

import numpy as np

from remhos_tpu import vis as vism
from remhos_tpu.config import RunConfig
from remhos_tpu.driver import run
from remhos_tpu.mesh import load_mesh


def test_mesh_roundtrip_2d(tmp_path):
    mesh = load_mesh("inline-quad", rs_levels=1)
    txt = vism.mfem_mesh_text(mesh, mesh.x)
    path = tmp_path / "rt2d.mesh"
    path.write_text(txt)
    r1 = run(RunConfig(mesh="inline-quad", problem=14, rs_levels=1, order=3,
                       dt=0.01, t_final=0.05, ho=3, lo=5, fct=2,
                       verbose=False))
    r2 = run(RunConfig(mesh=str(path), problem=14, rs_levels=0, order=3,
                       dt=0.01, t_final=0.05, ho=3, lo=5, fct=2,
                       verbose=False))
    assert abs(r1.final_mass_u - r2.final_mass_u) < 1e-13
    assert abs(r1.max_u - r2.max_u) < 1e-13


def test_mesh_roundtrip_3d(tmp_path):
    mesh = load_mesh("cube01_hex", rs_levels=1)
    path = tmp_path / "rt3d.mesh"
    path.write_text(vism.mfem_mesh_text(mesh, mesh.x))
    r1 = run(RunConfig(mesh="cube01_hex", problem=10, rs_levels=1, order=2,
                       dt=0.02, t_final=0.06, ho=3, lo=1, fct=1,
                       verbose=False))
    r2 = run(RunConfig(mesh=str(path), problem=10, rs_levels=0, order=2,
                       dt=0.02, t_final=0.06, ho=3, lo=1, fct=1,
                       verbose=False))
    assert abs(r1.final_mass_u - r2.final_mass_u) < 1e-13
    assert abs(r1.max_u - r2.max_u) < 1e-13


def test_save_final_artifacts(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    run(RunConfig(mesh="inline-quad", problem=14, rs_levels=1, order=2,
                  dt=0.01, t_final=0.02, ho=3, lo=5, fct=2, save=True,
                  verbose=False))
    mesh_txt = (tmp_path / "meshHO_final.mesh").read_text()
    gf_txt = (tmp_path / "sltn_final.gf").read_text()
    assert mesh_txt.startswith("MFEM mesh v1.0")
    assert "L2_T1_2D_P2" in mesh_txt            # moved GLL geometry nodes
    assert "L2_T2_2D_P2" in gf_txt              # Bernstein (Positive) field
    nd = 9                                       # p=2, 2D
    vals = gf_txt.split("Ordering: 0")[1].split()
    assert len(vals) % nd == 0


def test_glvis_stream_protocol():
    """A mock GLVis server receives one frame; check the protocol header
    and that a missing server is a quiet no-op."""
    mesh = load_mesh("inline-quad", rs_levels=0)
    u = np.zeros((mesh.num_elements, 16))
    received = []
    srv = socket.socket()
    srv.bind(("localhost", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def accept():
        conn, _ = srv.accept()
        chunks = []
        while True:
            b = conn.recv(65536)
            if not b:
                break
            chunks.append(b)
        received.append(b"".join(chunks))
        conn.close()

    th = threading.Thread(target=accept)
    th.start()
    ok = vism.glvis_stream(mesh, mesh.x, u, 3, port=port)
    th.join(timeout=5)
    srv.close()
    assert ok
    text = received[0].decode()
    assert text.startswith("solution\nMFEM mesh v1.0")
    assert "L2_T2_2D_P3" in text
    assert "window_title" in text

    # no server -> quiet failure
    assert vism.glvis_stream(mesh, mesh.x, u, 3, port=1) is False


def test_glvis_product_windows():
    """A -ps -vis run streams THREE windows — "Solution u", "Solution s"
    (ComputeRatio'd), "Solution u_s" — in the reference's side-by-side
    layout, plus the pre-loop initial frame (remhos.cpp:1045-1070,
    1307-1321)."""
    received = []
    srv = socket.socket()
    srv.bind(("localhost", 0))
    srv.listen(16)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def accept_loop():
        srv.settimeout(0.5)
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            chunks = []
            while True:
                b = conn.recv(65536)
                if not b:
                    break
                chunks.append(b)
            received.append(b"".join(chunks).decode())
            conn.close()

    th = threading.Thread(target=accept_loop)
    th.start()
    try:
        run(RunConfig(mesh="inline-quad", problem=14, rs_levels=1, order=2,
                      dt=0.005, t_final=0.75, max_tsteps=2, ho=3, lo=5,
                      fct=2, product_sync=True, ode_solver=1, vis=True,
                      vis_port=port, vis_steps=1, verbose=False))
    finally:
        stop.set()
        th.join(timeout=5)
        srv.close()
    titles = [line for f in received for line in f.splitlines()
              if line.startswith("window_title")]
    by_title = {}
    for t in titles:
        by_title[t] = by_title.get(t, 0) + 1
    assert by_title.get("window_title 'Solution u'", 0) >= 3    # init + 2
    assert by_title.get("window_title 'Solution s'", 0) >= 3
    assert by_title.get("window_title 'Solution u_s'", 0) >= 3
    # three-window layout: distinct window_geometry x-offsets
    geoms = {line.split()[1] for f in received for line in f.splitlines()
             if line.startswith("window_geometry")}
    assert geoms == {"0", "400", "800"}


def test_visit_datacollection(tmp_path, monkeypatch):
    """-visit writes VisItDataCollection layout (remhos.cpp:1036-1043):
    root JSON + per-cycle directory with MFEM mesh/field files."""
    import json

    monkeypatch.chdir(tmp_path)
    run(RunConfig(mesh="inline-quad", problem=14, rs_levels=1, order=2,
                  dt=0.01, t_final=0.03, ho=3, lo=5, fct=2, visit=True,
                  visit_prefix="Remhos", vis_steps=2, verbose=False))
    root0 = tmp_path / "Remhos_000000.mfem_root"
    assert root0.exists()                        # cycle-0 initial save
    roots = sorted(tmp_path.glob("Remhos_*.mfem_root"))
    assert len(roots) >= 2
    meta = json.loads(roots[-1].read_text())
    main = meta["dsets"]["main"]
    assert main["domains"] == 1
    assert "solution" in main["fields"]
    base = roots[-1].name.replace(".mfem_root", "")
    mesh_txt = (tmp_path / base / "mesh.000000").read_text()
    gf_txt = (tmp_path / base / "solution.000000").read_text()
    assert mesh_txt.startswith("MFEM mesh v1.0")
    assert "L2_T2_2D_P2" in gf_txt


def test_save_final_1d(tmp_path, monkeypatch):
    """1D runs can write MFEM segment meshes (geometry id 1)."""
    monkeypatch.chdir(tmp_path)
    run(RunConfig(mesh="periodic-segment", problem=0, rs_levels=2, order=3,
                  dt=0.005, t_final=0.02, ho=3, lo=5, fct=2, save=True,
                  verbose=False))
    mesh_txt = (tmp_path / "meshHO_final.mesh").read_text()
    gf_txt = (tmp_path / "sltn_final.gf").read_text()
    assert "L2_T1_1D_P" in mesh_txt              # segment GLL geometry nodes
    assert "L2_T2_1D_P3" in gf_txt               # Bernstein field
    elem_lines = mesh_txt.split("elements\n")[1].splitlines()
    assert elem_lines[1].startswith("1 1 ")      # attr 1, SEGMENT geometry


def test_checkpoint_global_order_across_shardings(tmp_path):
    """Checkpoints store S in GLOBAL element order: a checkpoint written by
    a 2-shard run resumes bit-compatibly in an unsharded run."""
    ck = str(tmp_path / "ck.npz")
    kw = dict(mesh="inline-quad", problem=14, rs_levels=1, order=2,
              dt=0.0015, t_final=0.75, ho=3, lo=5, fct=2, verbose=False)
    r_full = run(RunConfig(max_tsteps=8, **kw))
    run(RunConfig(max_tsteps=4, checkpoint_path=ck, checkpoint_steps=4,
                  n_shards=2, **kw))
    r_res = run(RunConfig(max_tsteps=8, checkpoint_path=ck, resume=True,
                          **kw))
    assert abs(r_full.final_mass_u - r_res.final_mass_u) < 1e-13
    assert abs(r_full.max_u - r_res.max_u) < 1e-13
    # and the reverse: unsharded checkpoint into a 2-shard resume
    run(RunConfig(max_tsteps=4, checkpoint_path=ck, checkpoint_steps=4,
                  **kw))
    r_res2 = run(RunConfig(max_tsteps=8, checkpoint_path=ck, resume=True,
                           n_shards=2, **kw))
    assert abs(r_full.final_mass_u - r_res2.final_mass_u) < 1e-13
