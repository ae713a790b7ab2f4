from vfisr_tpu.train.train import TrainState, create_train_state, make_train_step, vfi_loss

__all__ = ["TrainState", "create_train_state", "make_train_step", "vfi_loss"]
