"""CLI alias: ``python -m riptrm_tpu.experiment.simulate``."""
from riptrm_tpu.experiment.simulator import main

if __name__ == "__main__":
    main()
