from gpmpc_tpu.parallel.batched import BatchedStudy, StudyResult
from gpmpc_tpu.parallel import online_gp
from gpmpc_tpu.parallel.distributed import (initialize_multihost,
                                            make_study_mesh,
                                            batch_sharding, batch_spec,
                                            mesh_is_multiprocess,
                                            global_put, tree_global_put)

__all__ = ["BatchedStudy", "StudyResult", "online_gp",
           "initialize_multihost", "make_study_mesh",
           "batch_sharding", "batch_spec", "mesh_is_multiprocess",
           "global_put", "tree_global_put"]
