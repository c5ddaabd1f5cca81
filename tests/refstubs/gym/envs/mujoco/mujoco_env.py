class MujocoEnv:
    def __init__(self, *a, **k):
        raise NotImplementedError("refstubs gym has no MuJoCo simulator")
