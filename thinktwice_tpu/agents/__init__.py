from thinktwice_tpu.agents.roach import RoachPolicy, beta_mode, acc_to_control

__all__ = ["RoachPolicy", "beta_mode", "acc_to_control"]
