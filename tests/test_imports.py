"""Every module under viquae_tpu imports cleanly (no import-time network,
no gated third-party deps, no syntax rot in rarely-imported corners).
Heavy deps (jax/torch/transformers) must load lazily inside functions
where the module docstring promises it."""
import importlib
import pkgutil

import viquae_tpu


def test_all_modules_import():
    pkg = viquae_tpu
    failures = []
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        if info.name.endswith(".__main__"):
            continue  # argparses sys.argv at import by design
        if info.name.startswith("viquae_tpu.native._"):
            continue  # ctypes .so artifacts, not Python extension modules
        try:
            importlib.import_module(info.name)
        except SystemExit as e:
            failures.append((info.name, f"SystemExit({e.code})"))
        except Exception as e:  # noqa: BLE001
            failures.append((info.name, repr(e)))
    assert not failures, failures
