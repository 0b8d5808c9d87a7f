import numpy as np

from gym.spaces.box import Box


class Space:
    pass


class MultiBinary(Space):
    def __init__(self, n):
        self.n = n
        self.shape = (n,)
        self._rng = np.random.default_rng()

    def seed(self, seed=None):
        self._rng = np.random.default_rng(seed)

    def sample(self):
        return self._rng.integers(0, 2, size=self.shape).astype(np.int8)


__all__ = ["Box", "MultiBinary", "Space"]

from gym.spaces import box  # noqa: E402,F401  (gym.spaces.box.Box access)
