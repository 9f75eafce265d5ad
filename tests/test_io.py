"""Dump contract + checkpoint/resume."""

import json
import os

import numpy as np

from fluid_simulation_tpu.config import SimParams
from fluid_simulation_tpu.io.checkpoint import (
    load_checkpoint, latest_checkpoint, save_checkpoint)
from fluid_simulation_tpu.io.dump import (
    FIELD_FILES, FrameWriter, read_last_frame, read_run, run_and_dump)
from fluid_simulation_tpu.models.windtunnel import WindTunnel

P = SimParams(width=12, height=6, depth=5, solver="jacobi", acc=4)


def test_frame_writer_contract(tmp_path):
    d = str(tmp_path / "data")
    rng = np.random.default_rng(0)
    frames = [
        {k: rng.normal(size=P.padded_shape).astype(np.float32)
         for k, _ in FIELD_FILES}
        for _ in range(3)
    ]
    with FrameWriter(d, P) as w:
        for fr in frames:
            w.append(fr)

    frame_bytes = int(np.prod(P.padded_shape)) * 4
    for key, fn in FIELD_FILES:
        assert os.path.getsize(os.path.join(d, fn)) == 3 * frame_bytes

    # meta sidecar records the padded shape -> viewers never guess dims
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    assert meta["padded_shape"] == list(P.padded_shape)

    loaded = read_run(d)
    for key, _ in FIELD_FILES:
        assert loaded[key].shape == (3,) + P.padded_shape
        np.testing.assert_array_equal(loaded[key][1], frames[1][key])

    last = read_last_frame(d)
    np.testing.assert_array_equal(last["dens"], frames[-1]["dens"])

    # reference-tooling path: no meta.json, dims passed like the GUIs hardcode
    os.remove(os.path.join(d, "meta.json"))
    loaded2 = read_run(d, dims=(P.width, P.height, P.depth))
    np.testing.assert_array_equal(loaded2["vx"], loaded["vx"])


def test_run_and_dump_matches_live_state(tmp_path):
    d = str(tmp_path / "data")
    wt = WindTunnel(P)
    final = run_and_dump(wt, steps=7, out_dir=d, chunk=3)
    dumped = read_run(d)
    assert dumped["dens"].shape[0] == 7
    np.testing.assert_array_equal(dumped["dens"][-1], np.asarray(final.dens))
    np.testing.assert_array_equal(dumped["vx"][-1], np.asarray(final.vx))
    # obs duplicated per frame like the reference (simulation.cpp:144)
    np.testing.assert_array_equal(dumped["obs"][0], dumped["obs"][-1])


def test_checkpoint_resume_bitwise(tmp_path):
    ck = str(tmp_path / "ckpt")
    wt_a = WindTunnel(P)
    wt_a.simulate(steps=6)

    wt_b = WindTunnel(P)
    wt_b.simulate(steps=3)
    save_checkpoint(ck, wt_b.state, 3, P, obstacles=wt_b.obstacles)
    state, step, params, obstacles = load_checkpoint(ck)
    assert step == 3 and params == P and obstacles is not None

    wt_c = WindTunnel(params, obstacles=obstacles)
    wt_c.state = state
    wt_c.simulate(steps=3)

    for a, c in zip(wt_a.state, wt_c.state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_checkpoint_retention(tmp_path):
    ck = str(tmp_path / "ckpt")
    wt = WindTunnel(P)
    for s in range(5):
        save_checkpoint(ck, wt.state, s, P, keep=2)
    names = sorted(os.listdir(ck))
    assert sum(n.startswith("ckpt_") for n in names) == 2
    assert latest_checkpoint(ck).endswith("ckpt_00000004.npz")


def test_nan_watchdog(tmp_path):
    # the failure detector the reference lacks (SURVEY.md §5): divergence
    # triggers an emergency checkpoint and a loud error
    import pytest
    from fluid_simulation_tpu.io.dump import SimulationDiverged
    from fluid_simulation_tpu.io.checkpoint import load_checkpoint

    d = str(tmp_path / "data")
    # a dt so large the advection/projection blow up immediately is hard to
    # provoke in this stable scheme; inject the divergence directly instead
    wt = WindTunnel(P)
    wt.simulate(steps=1)
    bad = np.asarray(wt.state.vx).copy()
    bad[3, 3, 3] = np.nan
    wt.state = wt.state._replace(vx=bad)
    with pytest.raises(SimulationDiverged) as e:
        run_and_dump(wt, steps=4, out_dir=d, chunk=2)
    assert e.value.ckpt_path and os.path.exists(e.value.ckpt_path)
    # the checkpoint is the state before the diverging chunk (here: the
    # injected state itself), and no garbage frames were written
    state, step, params, obstacles = load_checkpoint(e.value.ckpt_path)
    np.testing.assert_array_equal(np.asarray(state.vx), bad)
    assert os.path.getsize(os.path.join(d, "data.bin")) == 0
