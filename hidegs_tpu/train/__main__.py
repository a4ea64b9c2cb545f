from hidegs_tpu.train.trainer import main

if __name__ == "__main__":
    main()
