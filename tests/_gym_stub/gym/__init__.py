"""Minimal OpenAI-gym API stub — just enough surface for the reference
mbt_gym package (mounted read-only at /root/reference) to import inside this
environment, where the real `gym` wheel is absent.  Used ONLY by
tests/test_vs_reference.py to run the *actual* reference implementation as
the bitwise seed-exactness oracle.  No simulation logic lives here.
"""
from gym import spaces  # re-export submodule

__version__ = "0.26.2-stub"


class Env:
    metadata = {}

    def reset(self):
        raise NotImplementedError

    def step(self, action):
        raise NotImplementedError

    def seed(self, seed=None):
        pass

    def close(self):
        pass


class Wrapper(Env):
    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        if name == "env":  # unset self.env must not recurse
            raise AttributeError(name)
        return getattr(self.env, name)
