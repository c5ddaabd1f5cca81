from egoego_release_tpu.rl.env import KinematicHumanoidEnv
from egoego_release_tpu.rl.ppo import PPOAgent, PPOConfig
from egoego_release_tpu.rl.rewards import REWARD_FUNCS, RewardContext
