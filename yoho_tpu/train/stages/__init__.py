"""Training stages 0-4 (the reference implements 0-1 and leaves 2-4 as
empty placeholder files — ``train/run_train_session.py:35-53``; here all
five are implemented)."""
