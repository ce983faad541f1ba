from .trainer import Trainable, fit, keras_adam
