from egoego_release_tpu.rl.env import KinematicHumanoidEnv
from egoego_release_tpu.rl.ppo import PPOAgent, PPOConfig
