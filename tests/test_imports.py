"""Import-everything smoke test (counterpart of the reference's
``check_all_py_imports.py`` CI script)."""
import importlib
import pkgutil

import mbt_gym_tpu


def test_import_all_modules():
    failures = []
    for mod in pkgutil.walk_packages(mbt_gym_tpu.__path__, prefix="mbt_gym_tpu."):
        try:
            importlib.import_module(mod.name)
        except Exception as exc:  # pragma: no cover
            failures.append((mod.name, repr(exc)))
    assert not failures, failures


def test_public_api_surface():
    for name in mbt_gym_tpu.__all__:
        assert hasattr(mbt_gym_tpu, name), name
