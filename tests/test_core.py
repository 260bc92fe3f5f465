import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viquae_tpu.core import config as cfg
from viquae_tpu.core import mesh as meshlib
from viquae_tpu.core.prng import SeedBundle


def test_mesh_axes(devices):
    ctx = meshlib.make_mesh(data=4, model=2, kb=1)
    assert ctx.data_size == 4 and ctx.model_size == 2 and ctx.kb_size == 1
    kb = meshlib.make_kb_mesh()
    assert kb.kb_size == 8


def test_mesh_sharding_put(devices):
    ctx = meshlib.make_kb_mesh()
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sharded = ctx.shard(x, meshlib.KB_AXIS)
    assert sharded.sharding.spec == jax.sharding.PartitionSpec(meshlib.KB_AXIS)
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_registry_and_tree_instantiation():
    @cfg.register("TestThing")
    class Thing:
        def __init__(self, a=1, child=None):
            self.a, self.child = a, child

    tree = {"model": {"class_name": "TestThing", "a": 5,
                      "child": {"class_name": "TestThing", "a": 7}}}
    out = cfg.instantiate_tree(tree)
    assert out["model"].a == 5 and out["model"].child.a == 7


def test_load_config(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nb:\n  c: [1, 2]\n")
    assert cfg.load_config(p) == {"a": 1, "b": {"c": [1, 2]}}
    j = tmp_path / "c.json"
    j.write_text('{"a": 2}')
    assert cfg.load_config(j) == {"a": 2}


def test_seed_bundle_deterministic():
    s1, s2 = SeedBundle(42), SeedBundle(42)
    k1, k2 = s1.split("dropout"), s2.split("dropout")
    assert jnp.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
    other = s1.split("init")
    assert not jnp.array_equal(jax.random.key_data(k1), jax.random.key_data(other))
    assert s1.host.integers(0, 100) == s2.host.integers(0, 100)


def test_stage_timer(tmp_path):
    import time as _time

    from viquae_tpu.core.profiling import StageTimer

    timer = StageTimer("test", log_path=str(tmp_path / "t.jsonl"))
    with timer.stage("work"):
        _time.sleep(0.01)
    with timer.stage("work"):
        _time.sleep(0.01)
    report = timer.report()
    assert report["work"]["count"] == 2
    assert report["work"]["total_s"] >= 0.02
    assert (tmp_path / "t.jsonl").exists()
    assert "work" in str(timer)
