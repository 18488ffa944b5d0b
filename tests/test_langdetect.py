"""Language identification accuracy (VERDICT r2 item 5).

Held-out labeled samples — written for this test, disjoint from the
profile seed text in ``yoho_tpu/text/lang_corpus.py`` — must classify at
>= 95% overall accuracy across >= 30 languages. Short-utterance and
unknown-input behavior is pinned explicitly. Reference capability:
``eld`` whitelisting in /root/reference/train/utils/dataloaders.py:44-50.
"""

from yoho_tpu.text.langdetect import (
    MIN_SCORE,
    detect_language,
    supported_languages,
)

HELDOUT: dict[str, list[str]] = {
    "en": ["My brother works at the hospital and usually comes back late in the evening.",
           "Did you see the letter that arrived yesterday from the bank?"],
    "de": ["Mein Bruder arbeitet im Krankenhaus und kommt meistens erst spät am Abend zurück.",
           "Hast du den Brief gesehen, der gestern von der Bank gekommen ist? Ich wollte ihn dir eigentlich schon zeigen."],
    "fr": ["Mon frère travaille à l'hôpital et rentre généralement tard le soir.",
           "As-tu vu la lettre qui est arrivée hier de la banque ? Je ne l'ai pas encore ouverte parce que nous étions pressés."],
    "es": ["Mi hermano trabaja en el hospital y suele volver tarde por la noche.",
           "¿Has visto la carta que llegó ayer del banco? Creo que deberíamos abrirla cuanto antes."],
    "it": ["Mio fratello lavora in ospedale e di solito torna tardi la sera.",
           "Hai visto la lettera che è arrivata ieri dalla banca?"],
    "pt": ["O meu irmão trabalha no hospital e costuma voltar tarde à noite.",
           "Viste a carta que chegou ontem do banco? Ainda não a abri porque estávamos com pressa."],
    "nl": ["Mijn broer werkt in het ziekenhuis en komt meestal laat in de avond terug.",
           "Heb je de brief gezien die gisteren van de bank is gekomen? Ik heb hem nog niet opengemaakt, omdat we haast hadden."],
    "sv": ["Min bror arbetar på sjukhuset och kommer oftast tillbaka sent på kvällen.",
           "Har du sett brevet som kom från banken igår? Jag har inte öppnat det ännu eftersom vi hade bråttom."],
    "da": ["Min bror arbejder på hospitalet og kommer som regel sent hjem om aftenen.",
           "Har du set det brev, der kom fra banken i går?"],
    "no": ["Broren min jobber på sykehuset og kommer vanligvis sent hjem om kvelden.",
           "Har du sett brevet som kom fra banken i går? Jeg har ikke åpnet det ennå fordi vi hadde det travelt."],
    "fi": ["Veljeni työskentelee sairaalassa ja palaa yleensä myöhään illalla.",
           "Näitkö kirjeen, joka saapui eilen pankista?"],
    "is": ["Bróðir minn vinnur á sjúkrahúsinu og kemur yfirleitt seint heim á kvöldin.",
           "Sástu bréfið sem kom frá bankanum í gær?"],
    "pl": ["Mój brat pracuje w szpitalu i zwykle wraca późno wieczorem.",
           "Widziałeś list, który przyszedł wczoraj z banku?"],
    "cs": ["Můj bratr pracuje v nemocnici a obvykle se vrací pozdě večer.",
           "Viděl jsi ten dopis, který včera přišel z banky?"],
    "sk": ["Môj brat pracuje v nemocnici a obyčajne sa vracia neskoro večer, keď už všetci spíme.",
           "Videl si ten list, ktorý včera prišiel z banky? Neviem, čo v ňom bolo napísané."],
    "sl": ["Moj brat dela v bolnišnici in se običajno vrne pozno zvečer.",
           "Si videl pismo, ki je včeraj prišlo z banke?"],
    "hr": ["Moj brat radi u bolnici i obično se vraća kasno navečer.",
           "Jesi li vidio pismo koje je jučer stiglo iz banke? Nisam ga još otvorio jer smo se žurili."],
    "sr": ["Мој брат ради у болници и обично се враћа касно увече.",
           "Јеси ли видео писмо које је јуче стигло из банке?"],
    "bg": ["Брат ми работи в болницата и обикновено се прибира късно вечерта.",
           "Видя ли писмото, което пристигна вчера от банката?"],
    "mk": ["Брат ми работи во болницата и обично се враќа доцна навечер, а секогаш ни носи нешто кога ќе се врати.",
           "Го виде ли писмото што пристигна вчера од банката? Не знам што пишува во него, ќе го отвориме заедно."],
    "ru": ["Мой брат работает в больнице и обычно возвращается поздно вечером.",
           "Ты видел письмо, которое вчера пришло из банка? Я ещё не открыл его, потому что мы очень спешили."],
    "uk": ["Мій брат працює в лікарні й зазвичай повертається пізно ввечері.",
           "Ти бачив листа, який учора надійшов із банку?"],
    "be": ["Мой брат працуе ў бальніцы і звычайна вяртаецца позна ўвечары.",
           "Ты бачыў ліст, які ўчора прыйшоў з банка?"],
    "ro": ["Fratele meu lucrează la spital și de obicei se întoarce târziu seara.",
           "Ai văzut scrisoarea care a sosit ieri de la bancă?"],
    "hu": ["A bátyám a kórházban dolgozik, és általában késő este ér haza.",
           "Láttad a levelet, amely tegnap érkezett a banktól?"],
    "et": ["Mu vend töötab haiglas ja tuleb tavaliselt hilja õhtul tagasi.",
           "Kas sa nägid kirja, mis eile pangast saabus? Ma ei ole seda veel avanud, sest meil oli kiire."],
    "lv": ["Mans brālis strādā slimnīcā un parasti atgriežas vēlu vakarā.",
           "Vai tu redzēji vēstuli, kas vakar pienāca no bankas?"],
    "lt": ["Mano brolis dirba ligoninėje ir paprastai grįžta vėlai vakare.",
           "Ar matei laišką, kuris vakar atėjo iš banko?"],
    "el": ["Ο αδερφός μου δουλεύει στο νοσοκομείο και συνήθως γυρίζει αργά το βράδυ.",
           "Είδες το γράμμα που ήρθε χθες από την τράπεζα;"],
    "tr": ["Kardeşim hastanede çalışıyor ve genellikle akşam geç saatte dönüyor.",
           "Dün bankadan gelen mektubu gördün mü?"],
    "az": ["Qardaşım xəstəxanada işləyir və adətən axşam gec qayıdır.",
           "Dünən bankdan gələn məktubu gördünmü?"],
    "ca": ["El meu germà treballa a l'hospital i normalment torna tard al vespre.",
           "Has vist la carta que va arribar ahir del banc?"],
    "gl": ["O meu irmán traballa no hospital e adoita volver tarde pola noite.",
           "Viches a carta que chegou onte do banco?"],
    "eu": ["Nire anaia ospitalean lan egiten du eta normalean berandu itzultzen da gauez.",
           "Ikusi al duzu atzo bankutik iritsi zen gutuna?"],
    "cy": ["Mae fy mrawd yn gweithio yn yr ysbyty ac fel arfer yn dod adref yn hwyr gyda'r nos.",
           "Welaist ti'r llythyr a ddaeth o'r banc ddoe?"],
    "ga": ["Oibríonn mo dheartháir san ospidéal agus is gnách go dtagann sé abhaile go déanach tráthnóna.",
           "An bhfaca tú an litir a tháinig ón mbanc inné?"],
    "sq": ["Vëllai im punon në spital dhe zakonisht kthehet vonë në mbrëmje.",
           "A e pe letrën që erdhi dje nga banka?"],
    "af": ["My broer werk by die hospitaal en kom gewoonlik laat in die aand terug.",
           "Het jy die brief gesien wat gister van die bank gekom het?"],
    "sw": ["Kaka yangu anafanya kazi hospitalini na kwa kawaida hurudi usiku sana.",
           "Uliiona barua iliyofika jana kutoka benki?"],
    "id": ["Kakak saya bekerja di rumah sakit dan biasanya pulang larut malam.",
           "Apakah kamu melihat surat yang datang kemarin dari bank? Saya belum bisa membacanya karena sedang sibuk sekali."],
    "ms": ["Abang saya bekerja di hospital dan kebiasaannya balik lewat malam kerana dia perlu menjaga pesakit.",
           "Adakah awak nampak surat yang sampai semalam daripada pihak bank? Saya belum sempat membacanya kerana sibuk sangat."],
    "tl": ["Nagtatrabaho ang kuya ko sa ospital at kadalasang umuuwi nang gabing-gabi na.",
           "Nakita mo ba ang sulat na dumating kahapon mula sa bangko?"],
    "vi": ["Anh trai tôi làm việc ở bệnh viện và thường về nhà muộn vào buổi tối.",
           "Bạn có thấy lá thư từ ngân hàng gửi đến hôm qua không?"],
    "th": ["พี่ชายของฉันทำงานที่โรงพยาบาลและมักจะกลับบ้านดึกตอนกลางคืน",
           "คุณเห็นจดหมายที่มาจากธนาคารเมื่อวานนี้ไหม"],
    "ko": ["우리 형은 병원에서 일해서 보통 저녁 늦게 돌아온다.",
           "어제 은행에서 온 편지를 봤니?"],
    "ja": ["私の兄は病院で働いていて、たいてい夜遅くに帰ってきます。",
           "昨日銀行から届いた手紙を見ましたか。"],
    "zh": ["我哥哥在医院工作，通常晚上很晚才回来。",
           "你看到昨天从银行寄来的信了吗？我还不知道里面写了什么。"],
    "ar": ["أخي يعمل في المستشفى وعادة ما يعود متأخرًا في المساء.",
           "هل رأيت الرسالة التي وصلت أمس من البنك؟"],
    "he": ["אחי עובד בבית החולים ובדרך כלל חוזר מאוחר בערב.",
           "ראית את המכתב שהגיע אתמול מהבנק?"],
    "fa": ["برادرم در بیمارستان کار می‌کند و معمولاً شب دیر برمی‌گردد.",
           "نامه‌ای را که دیروز از بانک رسید دیدی؟"],
    "ur": ["میرا بھائی ہسپتال میں کام کرتا ہے اور عام طور پر رات کو دیر سے لوٹتا ہے۔",
           "کیا تم نے وہ خط دیکھا جو کل بینک سے آیا تھا؟"],
    "hi": ["मेरा भाई अस्पताल में काम करता है और आम तौर पर रात को देर से लौटता है।",
           "क्या तुमने वह चिट्ठी देखी जो कल बैंक से आई थी?"],
    "mr": ["माझा भाऊ रुग्णालयात काम करतो आणि सहसा रात्री उशिरा परत येतो.",
           "काल बँकेतून आलेले पत्र तू पाहिलेस का?"],
    "bn": ["আমার ভাই হাসপাতালে কাজ করে এবং সাধারণত রাতে দেরি করে ফেরে।",
           "তুমি কি গতকাল ব্যাংক থেকে আসা চিঠিটা দেখেছ?"],
    "ta": ["என் அண்ணன் மருத்துவமனையில் வேலை செய்கிறான், பொதுவாக இரவு தாமதமாக வீடு திரும்புவான்.",
           "நேற்று வங்கியிலிருந்து வந்த கடிதத்தைப் பார்த்தாயா?"],
    "hy": ["Իմ եղբայրը աշխատում է հիվանդանոցում և սովորաբար ուշ է վերադառնում երեկոյան։",
           "Տեսա՞ր այն նամակը, որ երեկ եկավ բանկից։"],
    "ka": ["ჩემი ძმა საავადმყოფოში მუშაობს და ჩვეულებრივ საღამოს გვიან ბრუნდება.",
           "ნახე ის წერილი, რომელიც გუშინ ბანკიდან მოვიდა?"],
    "ne": ["मेरो भाइ अस्पतालमा काम गर्छ र प्रायः राति ढिलो फर्कन्छ।",
           "हिजो बैंकबाट आएको चिठी देख्यौ? मैले अझै खोलेको छैन, किनभने हामी हतारमा थियौं।"],
    "gu": ["મારો ભાઈ હોસ્પિટલમાં કામ કરે છે અને સામાન્ય રીતે રાત્રે મોડો પાછો આવે છે.",
           "ગઈકાલે બેંકમાંથી આવેલો પત્ર તેં જોયો?"],
    "pa": ["ਮੇਰਾ ਭਰਾ ਹਸਪਤਾਲ ਵਿੱਚ ਕੰਮ ਕਰਦਾ ਹੈ ਅਤੇ ਆਮ ਤੌਰ ਤੇ ਰਾਤ ਨੂੰ ਦੇਰ ਨਾਲ ਮੁੜਦਾ ਹੈ।",
           "ਕੱਲ੍ਹ ਬੈਂਕ ਤੋਂ ਆਈ ਚਿੱਠੀ ਤੂੰ ਵੇਖੀ?"],
    "kn": ["ನನ್ನ ಅಣ್ಣ ಆಸ್ಪತ್ರೆಯಲ್ಲಿ ಕೆಲಸ ಮಾಡುತ್ತಾನೆ ಮತ್ತು ಸಾಮಾನ್ಯವಾಗಿ ರಾತ್ರಿ ತಡವಾಗಿ ಮನೆಗೆ ಬರುತ್ತಾನೆ.",
           "ನಿನ್ನೆ ಬ್ಯಾಂಕಿನಿಂದ ಬಂದ ಪತ್ರವನ್ನು ನೋಡಿದೆಯಾ?"],
    "ml": ["എന്റെ സഹോദരൻ ആശുപത്രിയിൽ ജോലി ചെയ്യുന്നു, സാധാരണയായി രാത്രി വൈകിയാണ് വീട്ടിലെത്തുന്നത്.",
           "ഇന്നലെ ബാങ്കിൽ നിന്ന് വന്ന കത്ത് നീ കണ്ടോ?"],
    "si": ["මගේ අයියා රෝහලේ වැඩ කරනවා, සාමාන්‍යයෙන් රෑ පරක්කු වෙලා ගෙදර එනවා.",
           "ඊයේ බැංකුවෙන් ආපු ලියුම ඔයා දැක්කද?"],
    "la": ["Frater meus in valetudinario laborat et plerumque sero vesperi domum redit.",
           "Vidistine epistulam quae heri a mensa argentaria venit?"],
    "kk": ["Менің ағам ауруханада жұмыс істейді және әдетте кешке кеш қайтады.",
           "Кеше банктен келген хатты көрдің бе?"],
    "uz": ["Akam kasalxonada ishlaydi va odatda kechqurun kech qaytadi.",
           "Kecha bankdan kelgan xatni ko'rdingmi? Men uni hali ochmadim, chunki juda shoshilib yurgan edik."],
    "te": ["మా అన్నయ్య ఆసుపత్రిలో పని చేస్తాడు, సాధారణంగా రాత్రి ఆలస్యంగా ఇంటికి వస్తాడు.",
           "నిన్న బ్యాంకు నుంచి వచ్చిన ఉత్తరం చూశావా?"],
}


def test_covers_at_least_30_languages():
    langs = supported_languages()
    assert len(langs) >= 30, langs
    # every held-out language has a profile, and vice versa
    assert set(HELDOUT) == set(langs)


def test_heldout_accuracy_at_least_95_percent():
    total, hits, misses = 0, 0, []
    for lang, samples in HELDOUT.items():
        for s in samples:
            got = detect_language(s)
            total += 1
            if got.language == lang:
                hits += 1
            else:
                misses.append((lang, got.language, round(got.score, 3), s[:40]))
    acc = hits / total
    assert acc >= 0.95, f"accuracy {acc:.3f} over {total} samples; misses: {misses}"


def test_scores_are_calibrated_confidences():
    det = detect_language(HELDOUT["en"][0])
    assert det.language == "en" and MIN_SCORE < det.score <= 1.0


def test_short_utterances_still_classify():
    """Short inputs must not silently fall to 'und' (the stopword scorer's
    failure mode the VERDICT flagged): 2-4 word phrases classify."""
    cases = {
        "en": "thank you very much",
        "de": "vielen Dank für alles",
        "fr": "merci beaucoup pour tout",
        "es": "muchas gracias por todo",
        "ru": "большое спасибо за всё",
        "ja": "どうもありがとうございます",
    }
    for lang, phrase in cases.items():
        got = detect_language(phrase)
        assert got.language == lang, (phrase, got)
        assert got.score > MIN_SCORE


def test_und_behavior_is_defined():
    assert detect_language("").language == "und"
    assert detect_language("   \n\t ") == ("und", 0.0)
    assert detect_language("12345 67 89, 42!").language == "und"
    # Latin-alphabet gibberish scores below the threshold
    assert detect_language("qzx vkj wqp zzz xqv jzk").language == "und"


def test_diacritic_stripped_text_still_routes():
    """ASCII-fied text (common in chat transcripts) keeps enough trigram
    signal to route; the old scorer required exact stopword diacritics."""
    got = detect_language(
        "muj bratr pracuje v nemocnici a obvykle se vraci pozde vecer, "
        "ale dnes prisel driv, protoze nemel moc prace")
    assert got.language in ("cs", "sk"), got  # diacritics gone: sibling ok
    got = detect_language(
        "el meu germa treballa a l'hospital i normalment torna tard al "
        "vespre, pero avui ha arribat abans perque no tenia gaire feina")
    assert got.language == "ca", got


def test_corpus_whitelist_tiebreak_and_noise_fallback():
    """Integration with corpus whitelisting (found via end-to-end drive):
    a cs/sk near-tie in a cs-whitelisted corpus resolves to cs, and a
    hum-only transcript falls back to the whitelist head instead of being
    silently dropped (the VERDICT's 'silently dropping corpus files')."""
    from types import SimpleNamespace

    from yoho_tpu.text.corpus import transcript_language

    subs = [SimpleNamespace(content="Dobrý den, jak se dnes máte?"),
            SimpleNamespace(content="Myslím, že to bude dobré.")]
    assert transcript_language(subs, ["cs", "en"]) == "cs"

    noise = [SimpleNamespace(content="mm hmm 123")]
    assert transcript_language(noise, ["cs", "en"]) == "cs"
    assert transcript_language(noise, None) == "en"

    # An unambiguous non-whitelisted language is still reported as itself
    # (the caller then skips the file) - tie-break only rescues near-ties.
    ru = [SimpleNamespace(content="Сегодня утром было очень холодно, "
                                  "поэтому мы остались дома.")]
    assert transcript_language(ru, ["cs", "en"]) == "ru"
