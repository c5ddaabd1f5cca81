"""gym.utils.seeding stand-in (khrylib mujoco_env.py:2)."""
import numpy as np


def np_random(seed=None):
    rng = np.random.RandomState(seed)
    return rng, seed
