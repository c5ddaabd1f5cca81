"""evo.core.sync stand-in: the reference builds both trajectories with
identical synthetic timestamps, so association is the identity."""


def associate_trajectories(traj_ref, traj_est, max_diff=0.01, offset_2=0.0,
                           first_name="reference", snd_name="estimate"):
    return traj_ref, traj_est
