from fewbit_tpu.train.data import (  # noqa: F401
    batches_from_arrays, byte_lm_arrays, byte_lm_batches, load_glue,
    load_token_archive, load_tokenized_npz, real_doc_arrays,
    real_pair_arrays, real_text_corpus, real_text_documents,
    save_token_archive, synthetic_glue, synthetic_lm)
from fewbit_tpu.train.loop import (  # noqa: F401
    TrainConfig, TrainState, causal_lm_loss, create_train_state,
    make_eval_step, make_optimizer, make_schedule, make_train_step,
    restore_checkpoint, save_checkpoint)
