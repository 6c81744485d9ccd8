"""Model layer: end-to-end signal-chain pipelines composed from the DSP core.

The framework's "models" are configured signal-processing chains (the
reference's analysis scripts are their hand-run analogs):

* :class:`~sdr_channelizer_tpu.models.pipeline.ChannelizerPipeline` — the
  flagship: channelize -> noise floor -> PDW extraction, one jittable step
  (``create_pdws_channelized.m`` as a compiled program);
* :class:`~sdr_channelizer_tpu.parallel.pipeline.ShardedPipeline` — the same
  chain over a (time x chan) device mesh;
* :class:`~sdr_channelizer_tpu.models.pipeline.WidebandPdwPipeline` — the
  un-channelized detector (``create_pdws.m``).
"""

from sdr_channelizer_tpu.models.pipeline import (  # noqa: F401
    ChannelizerPipeline,
    WidebandPdwPipeline,
)
