"""TPU compute kernels: DSP (resample/filters), STFT/mel, Pallas ops."""

from .dsp import resample, lowpass_filter, highpass_filter  # noqa
