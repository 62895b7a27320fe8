from tgq.eval.ppl import evaluate_perplexity, build_window_requests, perplexity_from_token_stream
