from .synthetic import damped_sine_batch, damped_sine_iterator

__all__ = ["damped_sine_batch", "damped_sine_iterator"]
