"""Sharded pipeline vs single-device reference on the 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from cutesv_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8)


def test_sharded_cluster_sizes_match_serial(mesh8):
    bias = 200
    pos, valid, *_ = pmesh.demo_inputs(8)
    fn = pmesh.sharded_cluster_sizes(mesh8, bias)
    cid, sizes, n_clusters = jax.device_get(fn(pos, valid))
    pos_np = np.asarray(pos)
    valid_np = np.asarray(valid)
    # serial reference
    exp_cid = np.full(len(pos_np), -1)
    cur = -1
    prev = None
    for i in range(len(pos_np)):
        if not valid_np[i]:
            continue
        if prev is None or pos_np[i] - prev > bias:
            cur += 1 if prev is not None else 1
        if prev is None:
            cur = 0
        exp_cid[i] = cur
        prev = pos_np[i]
    assert list(cid) == list(exp_cid)
    exp_sizes = np.bincount(exp_cid[exp_cid >= 0])
    got = np.asarray(sizes)[:len(exp_sizes)]
    assert list(got) == list(exp_sizes)
    assert int(n_clusters) == len(exp_sizes)


def test_sharded_cluster_sizes_boundary_spanning(mesh8):
    """A single dense run of positions spanning every shard must form ONE
    cluster with the full global size."""
    n, rows = 8, 32
    pos = np.arange(n * rows, dtype=np.int32) * 10  # gaps of 10 << bias
    valid = np.ones(n * rows, bool)
    fn = pmesh.sharded_cluster_sizes(mesh8, 200)
    cid, sizes, n_clusters = jax.device_get(fn(pos, valid))
    assert set(cid.tolist()) == {0}
    assert int(sizes[0]) == n * rows
    assert int(n_clusters) == 1


def test_sharded_cover_counts(mesh8):
    pos, valid, sv_s, sv_e, starts, ends = pmesh.demo_inputs(8)
    fn = pmesh.sharded_cover_counts(mesh8)
    got = np.asarray(jax.device_get(fn(sv_s, sv_e, starts, ends)))
    s_np, e_np = np.asarray(sv_s), np.asarray(sv_e)
    st, en = np.asarray(starts), np.asarray(ends)
    exp = [(int(np.sum((st <= s) & (en >= e)))) for s, e in zip(s_np, e_np)]
    assert got.tolist() == exp
