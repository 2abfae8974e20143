from flink_rc_spark.rc.reservoir import (  # noqa: F401
    ReservoirConfig,
    init_weights,
    reservoir_scan,
    run_reservoir,
    washout,
)
from flink_rc_spark.rc.readout import (  # noqa: F401
    fit_readout_collect,
    fit_readout_distributed,
    mse,
    predict,
)
from flink_rc_spark.rc.online import online_sgd  # noqa: F401
from flink_rc_spark.rc.pipeline import ESNPipeline  # noqa: F401

import flink_rc_spark.rc.queries  # noqa: F401, E402  (registers q_esn_*, q_lr_online)
