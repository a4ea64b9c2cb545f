from hidegs_tpu.train.trainer import main

main()
