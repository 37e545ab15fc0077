from canonicalvoting_tpu.sunrgbd.proposal import (  # noqa: F401
    HoughVotingProposal,
    farthest_point_sample,
    query_ball_point,
    square_distance,
)
