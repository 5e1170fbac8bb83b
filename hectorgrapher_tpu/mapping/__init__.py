from hectorgrapher_tpu.mapping.grids import (  # noqa: F401
    GridMeta,
    ProbabilityGrid,
    TSDFGrid,
    cell_center,
    cell_index,
    flat_index,
    in_bounds,
    make_meta,
    make_probability_grid,
    make_tsdf_grid,
)
