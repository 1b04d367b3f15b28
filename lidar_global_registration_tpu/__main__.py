from lidar_global_registration_tpu.cli import main

main()
