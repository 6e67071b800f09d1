"""DiNTS search mode: TopologySearch supernet, decode, retrain round-trip.

Closes the last model-namespace gap (`monai.networks.nets.TopologySearch`,
resolved by the reference's star-import —
/root/reference/unet3d/models/pytorch/__init__.py:1). The search space here is
the TPU-native re-design: arch logits are ordinary parameters driving a
weighted supernet forward (models/dints.py TopologySearch docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.models.dints import DiNTS, TopologyInstance, TopologySearch
from unet3d_tpu.models.registry import create_model, init_params


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


@pytest.fixture(scope="module")
def search_net():
    space = TopologySearch(num_blocks=2, num_depths=2, channel_mul=0.25)
    net = DiNTS(dints_space=space, num_classes=2)
    x = _rand((1, 16, 16, 16, 1))
    v = net.init({"params": jax.random.PRNGKey(0)}, x, False)
    return space, net, x, v


def test_topology_search_supernet_forward_and_grad(search_net):
    space, net, x, v = search_net
    y = net.apply(v, x, False)
    assert y.shape == (1, 16, 16, 16, 2)
    assert "log_alpha_a" in v["params"] and "log_alpha_c" in v["params"]
    n_e = len(space.edges)
    assert v["params"]["log_alpha_a"].shape == (2, n_e)
    assert v["params"]["log_alpha_c"].shape == (2, n_e, 5)

    # arch logits receive gradients through the weighted forward
    def loss_fn(p):
        return jnp.mean(net.apply({"params": p}, x, False) ** 2)

    g = jax.grad(loss_fn)(v["params"])
    assert float(jnp.abs(g["log_alpha_a"]).sum()) > 0
    assert float(jnp.abs(g["log_alpha_c"]).sum()) > 0


def test_topology_search_decode_builds_valid_instance(search_net):
    space, net, x, v = search_net
    rng = np.random.RandomState(1)
    log_a = rng.randn(2, len(space.edges)) * 2
    log_c = rng.randn(2, len(space.edges), 5) * 2
    code_a, code_c, node_a = space.decode(log_a, log_c)

    # decoded codes construct a TopologyInstance (feasibility guaranteed)
    inst = TopologyInstance(arch_code=(code_a, code_c), num_blocks=2,
                            num_depths=2, channel_mul=0.25)
    assert len(node_a) == 3 and all(len(row) == 2 for row in node_a)
    # node_a[0] is the stem: all active
    assert node_a[0] == [1, 1]

    # retrain the decoded instance end-to-end
    retrain = DiNTS(dints_space=inst, num_classes=2)
    xv = _rand((1, 16, 16, 16, 1))
    vi = retrain.init({"params": jax.random.PRNGKey(0)}, xv, False)
    assert retrain.apply(vi, xv, False).shape == (1, 16, 16, 16, 2)


def test_topology_search_decode_tracks_strong_edges():
    space = TopologySearch(num_blocks=2, num_depths=2)
    n_e = len(space.edges)  # 4 edges at depth 2
    # strongly favor: block 0 all edges on; block 1 only flat edges
    log_a = np.full((2, n_e), 4.0)
    flat = [e for e, (s, d) in enumerate(space.edges) if s == d]
    log_a[1, :] = -4.0
    for e in flat:
        log_a[1, e] = 4.0
    log_c = np.zeros((2, n_e, 5))
    log_c[:, :, 1] = 3.0  # conv_3x3x3 everywhere
    code_a, code_c, node_a = space.decode(log_a, log_c)
    assert all(code_a[1][e] == 1 for e in flat)
    assert all(code_c[b][e] == 1 for b in range(2) for e in range(n_e)
               if code_a[b][e])


def test_topology_search_entropy_and_ram_metrics():
    space = TopologySearch(num_blocks=3, num_depths=3)
    n_e = len(space.edges)
    rng = np.random.RandomState(2)
    log_a = rng.randn(3, n_e)
    ent = space.get_topology_entropy(log_a)
    assert np.isfinite(ent) and ent > 0
    # consistent (all-on) topology has lower entropy than a random one
    ent_on = space.get_topology_entropy(np.full((3, n_e), 6.0))
    assert ent_on < ent
    ram = space.get_ram_cost_usage((2, 1, 96, 96, 96), log_a)
    ram_full = space.get_ram_cost_usage((2, 1, 96, 96, 96), log_a, full=True)
    assert 0 < ram < ram_full


def test_dints_partial_topology_dark_node():
    """Reachability semantics: a depth with no active input goes dark and the
    decoder skips it (previously this raised)."""
    # depth-2 never receives input and never sources an edge
    edges = TopologyInstance(num_depths=3, num_blocks=1).edges
    keep = [1 if (s != 2 and d != 2) else 0 for (s, d) in edges]
    code_a = [keep] * 2
    code_c = [[1] * len(edges)] * 2
    inst = TopologyInstance(arch_code=(code_a, code_c), num_blocks=2)
    assert inst.node_active[-1] == [True, True, False]
    net = DiNTS(dints_space=inst, num_classes=2)
    x = _rand((1, 16, 16, 16, 1))
    v = net.init({"params": jax.random.PRNGKey(0)}, x, False)
    assert net.apply(v, x, False).shape == (1, 16, 16, 16, 2)


def test_dints_edge_from_dark_node_raises():
    edges = TopologyInstance(num_depths=3, num_blocks=1).edges
    # block 0 activates only depths {0,1}; block 1 sources from depth 2
    block0 = [1 if d != 2 else 0 for (s, d) in edges]
    block1 = [1 if s == 2 else 0 for (s, d) in edges]
    with pytest.raises(ValueError, match="no active input path"):
        TopologyInstance(arch_code=([block0, block1], [[1] * len(edges)] * 2),
                         num_blocks=2)


def test_topology_search_resolvable_by_config_name():
    space = create_model("TopologySearch", num_blocks=2, num_depths=2)
    assert isinstance(space, TopologySearch)
    net = create_model("DiNTS",
                       dints_space={"search": True, "num_blocks": 2,
                                    "num_depths": 2, "channel_mul": 0.25},
                       num_classes=1)
    v = init_params(net, (16, 16, 16, 1))
    assert "log_alpha_a" in v["params"]
