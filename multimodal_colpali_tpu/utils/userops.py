"""Multi-user app leftovers: password email, per-user data seeding, sync
VLM summarizer with checkpointing.

Ports of the reference's L9 utilities (SURVEY.md §1): send_password_email
(functions.py:1769-1809), new_user_set_files (functions.py:1866-1868), and
the synchronous per-image summarizer ``api_models_one_img``
(functions.py:526-566, tenacity backoff + periodic pickle checkpoints).
"""

from __future__ import annotations

import os
import smtplib
import time
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText
from typing import Any, Dict, List, Optional, Sequence

import httpx

from multimodal_colpali_tpu.api import save_to_pickle, setup_initial_vector_db
from multimodal_colpali_tpu.generation import encode_image


def send_password_email(sender_email: str, sender_password: str,
                        recipient_username: str, recipient_email: str,
                        password: str,
                        smtp_server: str = "smtp.gmail.com",
                        smtp_port: int = 587) -> None:
    """Send a password-reset email (SMTP + STARTTLS)."""
    subject = "SynHealth app testing: new password"
    body = (
        f"Dear {recipient_username},\n\n"
        f"Your password has been reset and your login credentials are:\n\n"
        f"username: {recipient_username}\npassword: {password}\n\n"
        f"You can change your password in the user settings.\n"
    )
    msg = MIMEMultipart()
    msg["From"] = sender_email
    msg["To"] = recipient_email
    msg["Subject"] = subject
    msg.attach(MIMEText(body, "plain"))
    with smtplib.SMTP(smtp_server, smtp_port) as server:
        server.starttls()
        server.login(sender_email, sender_password)
        server.send_message(msg)


def new_user_set_files(username: str,
                       input_filename: str = "./src/vectordb/context_base.tar.gz",
                       user_root: str = "./src/vectordb/user_data") -> str:
    """Seed a new user's data directory from the base snapshot
    (reference functions.py:1866-1868)."""
    output_dir = os.path.join(user_root, username)
    setup_initial_vector_db(input_filename, output_dir)
    return output_dir


def api_models_one_img(
    img_links: Sequence[str],
    texts: Sequence[str],
    models_data: Sequence[Dict[str, Any]],
    img_prompt: str,
    text_prompt: str,
    max_tokens: int = 300,
    text_cutoff: int = 1500,
    save_tmp: str = "tmp_save2.pkl",
    retries: int = 10,
    base_backoff: float = 10.0,
    max_backoff: float = 180.0,
) -> List[Dict[str, Any]]:
    """Per-image chat completion with exponential backoff and periodic
    pickle checkpoints (reference functions.py:526-566), over plain HTTP."""
    gen_text: List[Dict[str, Any]] = []
    for model_data in models_data:
        print(f"Processing for {model_data['model_id']}.")
        url = model_data["api_url"].rstrip("/") + "/chat/completions"
        headers = {"Authorization": f"Bearer {model_data.get('api_key') or 'EMPTY'}",
                   "Content-Type": "application/json"}
        tmp_data = []
        for img_link, text in zip(img_links, texts):
            if img_link == "":
                part = [{"type": "text", "text": text_prompt + text}]
            else:
                part = [
                    {"type": "text", "text": img_prompt},
                    {"type": "image_url", "image_url": {
                        "url": f"data:image/jpeg;base64,{encode_image(img_link)}"}},
                ]
            body = {
                "model": model_data["model_id"],
                "messages": [{"role": "user", "content": part}],
                "max_completion_tokens": max_tokens,
            }
            content: Optional[str] = None
            for attempt in range(retries):
                try:
                    r = httpx.post(url, headers=headers, json=body, timeout=120)
                    r.raise_for_status()
                    content = r.json()["choices"][0]["message"]["content"]
                    break
                except (httpx.HTTPError, KeyError, IndexError):
                    if attempt == retries - 1:
                        raise
                    time.sleep(min(base_backoff * (2 ** attempt), max_backoff))
            one_resp = {"model": model_data["model_id"], "link": img_link,
                        "output": (content or "")[:text_cutoff]}
            tmp_data.append(one_resp)
            gen_text.append(one_resp)
        tmp_save = model_data["model_id"].split("/")[-1]
        save_to_pickle(tmp_save[:15] + ".pkl", processed_tmp=tmp_data)
    return gen_text
