"""Synthetic signal generators — the reference's fixtures layer
(``matlab/generate_training_iq.m``, ``generate_pulsed_iq.m``,
``generate_channelized_training_iq.m``)."""

from sdr_channelizer_tpu.signal.synth import (  # noqa: F401
    PulseTrainSpec,
    pulse_train,
    pulse_starts,
    random_pulse_train_spec,
    write_training_iq,
    barker13_phase,
)
