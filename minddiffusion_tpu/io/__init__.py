from minddiffusion_tpu.io.checkpoints import save_checkpoint, load_checkpoint, CheckpointManager

__all__ = ["save_checkpoint", "load_checkpoint", "CheckpointManager"]
