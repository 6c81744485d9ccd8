"""Command-line interface: ``python -m sdr_channelizer_tpu <command>``.

Commands mirror the reference's scripts and binaries one-to-one:
``generate`` (generate_training_iq.m), ``record`` (the recorders' CLI via
the emulator), ``gain-search`` (blade_find_max_unsaturated_gain),
``convert`` (convert_my_iq_to_mat.m / convert_iq_to_mat.m), ``channelize``
(channelizer_example.m), ``pdw`` (create_pdws.m /
create_pdws_channelized.m), ``predict`` (predict_event.m), ``track``
(usrp_predict_event), ``spectrogram`` (spectrogram_my_iq.m), ``plot``
(plot_my_iq.m), and ``bench``.
"""

from sdr_channelizer_tpu.cli.main import main  # noqa: F401
