from dynslam_tpu.viz.meshing import extract_mesh, save_engine_mesh, write_obj  # noqa: F401
