from .preprocess import (
    LocalGraph,
    VoxelGraph,
    process_building,
    create_dataset,
    load_local,
    load_voxel,
    save_local,
    save_voxel,
)
from .batching import PackedBatch, pack_graphs, pack_one, stack_packs
from .grid import GridBatch, pack_grid, grid_compatible, stack_grid_batches
