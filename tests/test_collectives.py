import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax spells it experimental
    from jax.experimental.shard_map import shard_map

from seam_match_rcnn_tpu.parallel import collectives as C
from seam_match_rcnn_tpu.parallel.mesh import make_mesh


def test_reduce_dict_pmean_over_mesh():
    mesh = make_mesh(data=8)

    def fn(x):
        d = {"loss": jnp.sum(x), "aux": jnp.max(x)}
        return C.reduce_dict(d, "data")

    f = shard_map(fn, mesh=mesh, in_specs=P("data"), out_specs=P())
    x = jnp.arange(16, dtype=jnp.float32)
    out = f(x)
    # pmean of per-shard sums = total/8
    assert float(out["loss"]) == float(jnp.sum(x)) / 8


def test_all_gather_over_mesh():
    mesh = make_mesh(data=8)
    kw = dict(mesh=mesh, in_specs=P("data"), out_specs=P(None))
    try:  # jax>=0.8 spells the varying-ness checker check_vma
        f = shard_map(lambda x: C.all_gather(x, "data"), check_vma=False, **kw)
    except TypeError:
        f = shard_map(lambda x: C.all_gather(x, "data"), check_rep=False, **kw)
    x = jnp.arange(8, dtype=jnp.float32)
    out = np.asarray(f(x))
    assert out.shape == (8, 1)
    np.testing.assert_array_equal(out.ravel(), np.arange(8))


def test_host_helpers_single_process():
    assert C.process_count() == 1
    assert C.is_main_process()
    assert C.gather_objects({"a": 1}) == [{"a": 1}]


def test_multihost_gate_warns_on_pod_markers(monkeypatch):
    """SEAM_MULTIHOST unset on a machine with pod-environment markers must
    warn loudly (silently-independent-replicas hazard, ADVICE r1)."""
    import warnings

    monkeypatch.delenv("SEAM_MULTIHOST", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        C.initialize_distributed()
    assert any("SEAM_MULTIHOST" in str(w.message) for w in rec)

    # no markers -> silent no-op
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        C.initialize_distributed()
    assert not rec
